package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR-style data selection: hashed n-gram importance resampling
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"). Documents from a raw crawl are weighted by how much
  * their hashed unigram+bigram distribution looks like a small target
  * (quality) corpus, then selected by Gumbel top-k — sampling without
  * replacement proportional to the importance weights.
  *
  * Scale shape (the reason the op is bucketed):
  *  - The MODEL is one table of `numBuckets` log-ratios — fitting is two
  *    corpus passes that partial-aggregate down to `numBuckets` rows
  *    (map-side combine; the shuffle moves at most numBuckets rows per
  *    task), and the fitted artifact is kilobytes, broadcast at any
  *    corpus size.
  *  - SERVING is map-only feature hashing plus one broadcast join and a
  *    per-doc partial agg — the 100 TB crawl is scanned once, nothing
  *    corpus-sized shuffles.
  *  - SELECTION is Gumbel top-k via TakeOrderedAndProject (per-partition
  *    top-k, then a k-row driver merge) — no global sort.
  *
  * Determinism contract (oracle-twin discipline, see [[Neutral]]):
  * buckets come from the first 16 bits of md5("dsir:" || gram) so both
  * engines hash identically (numBuckets must divide 2^16 to keep the mod
  * unbiased); every ln rounds to DECIMAL(18,6) at the leaf and per-doc
  * sums accumulate in exact decimal arithmetic; the Gumbel noise derives
  * from the md5-uniform u = (hex16("dsirg:" || id) + 0.5) / 2^16.
  */
object Dsir {

  /** Buckets in the hashed feature space. Must divide 2^16 (the md5
    * prefix width) so the bucket mod is exactly uniform. */
  val DefaultBuckets = 512

  private val dec = DecimalType(18, 6)

  private def wsCol(textCol: String): Column =
    filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= "")

  /** Unigrams ++ adjacent bigrams ("w1 w2") — the paper's feature set. */
  private def gramsCol(textCol: String): Column = {
    val ws = wsCol(textCol)
    val bigrams = when(size(ws) >= 2,
      zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    concat(ws, bigrams)
  }

  /** First 16 bits of md5("dsir:" || gram) mod numBuckets — the hashed
    * feature index, engine-neutral by the md5 seeding contract. */
  private def bucketCol(gram: Column, numBuckets: Int): Column =
    conv(substring(md5(concat(lit("dsir:"), gram)), 1, 4), 16, 10)
      .cast("long") % numBuckets

  /** (id, bucket) — one row per gram occurrence. Map-only. The compiled
    * [[graft.expr.DsirGramBuckets]] kernel replaces the
    * explode(grams)+md5-hex+conv chain: the composable form re-entered
    * the interpreted zip_with lambda per bigram and round-tripped every
    * gram through a 32-char hex string to read 2 bytes back out
    * (ExprSpec pins the kernel bit-identical to [[bucketedRef]]). */
  private def bucketed(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame =
    docs.select(col(idCol),
      explode(graft.expr.DsirGramBuckets.dsirGramBuckets(
        lower(trim(col(textCol))), numBuckets)).as("bucket"))

  /** Built-in-functions reference form of [[bucketed]] — the semantic
    * spec the kernel must match bit-for-bit (ExprSpec). Operators run
    * the kernel. */
  private[graft] def bucketedRef(docs: DataFrame, idCol: String,
      textCol: String, numBuckets: Int): DataFrame =
    docs.select(col(idCol), explode(gramsCol(textCol)).as("gram"))
      .select(col(idCol), bucketCol(col("gram"), numBuckets).as("bucket"))

  /** One corpus pass → per-bucket gram-occurrence counts (≤ numBuckets
    * rows after the partial-agg shuffle). */
  private def bucketCounts(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int, as: String): DataFrame =
    bucketed(df, idCol, textCol, numBuckets)
      .groupBy("bucket").agg(count(lit(1)).as(as))

  /** Model from count tables: per-bucket log importance ratio
    * lr[b] = ln p̂_target[b] − ln p̂_raw[b], both Laplace-smoothed
    * ((c_b + 1) / (T + numBuckets)) and each ln rounded to DECIMAL(18,6)
    * before the subtraction. Returns the numBuckets-row model table
    * (bucket, lr) — every bucket present, broadcastable. Counts in, so
    * the count-form artifact ([[dsirBuildCounts]]) rebuilds the model at
    * load for free (a numBuckets-row transform). */
  private def modelOfCounts(spark: SparkSession, rawC: DataFrame,
      tgtC: DataFrame, numBuckets: Int): DataFrame = {
    val rawT = rawC.agg(coalesce(sum(col("nr")), lit(0L)).as("tr"))
    val tgtT = tgtC.agg(coalesce(sum(col("nt")), lit(0L)).as("tt"))
    def smoothedLn(n: Column, tot: Column): Column =
      log((coalesce(n, lit(0L)) + 1).cast("double") / (tot + numBuckets))
        .cast(dec)
    spark.range(numBuckets).toDF("bucket")
      .join(rawC, Seq("bucket"), "left")
      .join(tgtC, Seq("bucket"), "left")
      .join(broadcast(rawT))
      .join(broadcast(tgtT))
      .select(col("bucket"),
        (smoothedLn(col("nt"), col("tt"))
          - smoothedLn(col("nr"), col("tr"))).cast(dec).as("lr"))
  }

  /** Fit from corpora (see [[modelOfCounts]] for the ratio contract). */
  def dsirModel(raw: DataFrame, target: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numBuckets: Int = DefaultBuckets): DataFrame = {
    require(65536 % numBuckets == 0,
      s"numBuckets=$numBuckets must divide 2^16 for an unbiased bucket mod")
    modelOfCounts(raw.sparkSession,
      bucketCounts(raw, idCol, textCol, numBuckets, "nr"),
      bucketCounts(target, idCol, textCol, numBuckets, "nt"), numBuckets)
  }

  /** Apply: per-doc importance log-weight — the sum of the model's
    * log-ratios over the doc's gram occurrences (exact decimal sum,
    * surfaced as DOUBLE; the decimal sum rides along as `__lw` for
    * [[dsirResample]]'s key arithmetic). Docs with zero grams have no
    * weight rows, as in the paper (nothing to resample on). One
    * broadcast join, one per-doc partial agg; the corpus never shuffles
    * whole. `numBuckets` must match the model's feature space. */
  def dsirWeightsWith(docs: DataFrame, model: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = DefaultBuckets): DataFrame =
    dsirWeightsWithN(docs, model, idCol, textCol, numBuckets)

  private def dsirWeightsWithN(docs: DataFrame, model: DataFrame,
      idCol: String, textCol: String, numBuckets: Int): DataFrame =
    bucketed(docs, idCol, textCol, numBuckets)
      .join(broadcast(model), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum(col("lr")).as("__lw"))
      .select(col(idCol), col("n_grams"),
        col("__lw").cast("double").as("dsir_logw"), col("__lw"))

  /** Fit-and-weight in one call: target = `targetWhere` slice of `docs`,
    * raw = all of `docs` (the paper's raw-vs-target contrast). Because
    * the target is a SUBSET of the raw corpus here, both count tables
    * come from ONE gram pass (conditional count on the target predicate)
    * instead of dsirModel's two — one fewer full-corpus explode+hash
    * scan, byte-identical counts. */
  def dsirWeights(docs: DataFrame, targetWhere: Column,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = DefaultBuckets): DataFrame =
    dsirWeightsWithN(docs,
      dsirModelSubset(docs, targetWhere, textCol, idCol, numBuckets),
      idCol, textCol, numBuckets)

  /** Fit when the target is a SUBSET of the raw corpus (the common
    * in-query shape): ONE gram pass with a conditional target count
    * instead of [[dsirModel]]'s two — byte-identical counts, one fewer
    * full-corpus explode+hash scan. */
  def dsirModelSubset(raw: DataFrame, targetWhere: Column,
      textCol: String = "text", idCol: String = "doc_id",
      numBuckets: Int = DefaultBuckets): DataFrame = {
    require(65536 % numBuckets == 0,
      s"numBuckets=$numBuckets must divide 2^16 for an unbiased bucket mod")
    // the ≤numBuckets-row count table feeds both the ratio join and the
    // totals — pin it so the corpus gram pass runs once (the lmBigramModel
    // n12 precedent; the cache is bucket-bounded, never corpus-sized)
    val counts = Pins.track(raw
      .select(targetWhere.as("__t"),
        explode(graft.expr.DsirGramBuckets.dsirGramBuckets(
          lower(trim(col(textCol))), numBuckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("nr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("nt"))
      .cache())
    modelOfCounts(raw.sparkSession,
      counts.select("bucket", "nr"), counts.select("bucket", "nt"),
      numBuckets)
  }

  /** The artifact's bucket-space record: serving with a numBuckets
    * different from the build's silently drops grams (larger) or scores
    * against wrong ratios (smaller) — plausible-looking garbage. Every
    * build persists a 1-row meta table; every serve/append validates the
    * caller's value against it and fails fast on mismatch. */
  private def saveMeta(spark: SparkSession, dir: String,
      numBuckets: Int): Unit =
    Models.save(spark.range(1).select(lit(numBuckets).as("num_buckets")),
      s"$dir/meta")

  private def requireMeta(spark: SparkSession, dir: String,
      numBuckets: Int): Unit = {
    val m = Models.load(spark, s"$dir/meta").head().getAs[Int]("num_buckets")
    require(m == numBuckets,
      s"numBuckets=$numBuckets does not match the artifact's bucket space " +
        s"($m) persisted at $dir/meta — rebuild or pass the artifact's value")
  }

  /** Persist the fitted model (one parquet table, numBuckets rows, plus
    * the 1-row bucket-space meta). Deterministic fit ⇒ byte-identical on
    * rebuild, so served weights share the fit form's oracle. */
  def dsirBuild(raw: DataFrame, target: DataFrame, dir: String,
      textCol: String = "text", idCol: String = "doc_id",
      numBuckets: Int = DefaultBuckets): Unit = {
    Models.save(dsirModel(raw, target, textCol, idCol, numBuckets),
      s"$dir/logratio")
    saveMeta(raw.sparkSession, dir, numBuckets)
  }

  /** Weight a corpus against a PERSISTED model — zero fitting at serve
    * time (the daily-crawl selection pass). Fails fast if `numBuckets`
    * disagrees with the artifact's persisted bucket space. */
  def dsirServe(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = DefaultBuckets): DataFrame = {
    requireMeta(spark, dir, numBuckets)
    dsirWeightsWithN(docs, Models.load(spark, s"$dir/logratio"), idCol,
      textCol, numBuckets)
  }

  /** COUNT-form artifact: persist the raw/target bucket-count tables
    * instead of precomputed log-ratios. Counts are ADDITIVE — the raw
    * side tracks a growing crawl via [[dsirAppendRaw]] with no refit
    * scan of old data — and the log-ratio model rebuilds from them at
    * load time as a numBuckets-row transform (free). This is the DSIR
    * twin of the dedup index's append lifecycle. */
  def dsirBuildCounts(raw: DataFrame, target: DataFrame, dir: String,
      textCol: String = "text", idCol: String = "doc_id",
      numBuckets: Int = DefaultBuckets): Unit = {
    require(65536 % numBuckets == 0,
      s"numBuckets=$numBuckets must divide 2^16 for an unbiased bucket mod")
    Models.save(bucketCounts(raw, idCol, textCol, numBuckets, "nr"),
      s"$dir/raw_counts")
    Models.save(bucketCounts(target, idCol, textCol, numBuckets, "nt"),
      s"$dir/target_counts")
    saveMeta(raw.sparkSession, dir, numBuckets)
  }

  /** Fold a new raw batch's bucket counts into the count-form artifact —
    * scan the BATCH only; the loaded table may then hold several rows
    * per bucket, summed at load. Validates the bucket space against the
    * artifact's meta (an append in a different space would corrupt every
    * later serve). */
  def dsirAppendRaw(newRaw: DataFrame, dir: String,
      textCol: String = "text", idCol: String = "doc_id",
      numBuckets: Int = DefaultBuckets): Unit = {
    requireMeta(newRaw.sparkSession, dir, numBuckets)
    Models.append(bucketCounts(newRaw, idCol, textCol, numBuckets, "nr"),
      s"$dir/raw_counts")
  }

  /** Compact the count-form artifact: fold the appended per-bucket rows
    * to one row per bucket (the exact integer sum serve performs at
    * load). Serve-after-compact is bit-identical; what it buys is the
    * load-time fold shrinking from O(batches·buckets) rows back to the
    * numBuckets bound. Checkpoint RDD ids are Pins-tracked (the table is
    * bucket-bounded, so the checkpoint is tiny). */
  def dsirCompactCounts(spark: SparkSession, dir: String,
      numBuckets: Int = DefaultBuckets): Unit = {
    requireMeta(spark, dir, numBuckets)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val folded = Models.load(spark, s"$dir/raw_counts")
      .groupBy("bucket").agg(sum(col("nr")).cast("long").as("nr"))
      .localCheckpoint()
    Pins.trackRdds(sc, sc.getPersistentRDDs.keySet -- before)
    Models.save(folded, s"$dir/raw_counts")
  }

  /** Weight a corpus against the COUNT-form artifact: sum the (possibly
    * appended) per-bucket count rows, rebuild the log-ratio model (a
    * numBuckets-row job), and serve. Bit-identical to a full refit on
    * the same cumulative corpus — exact decimal/count arithmetic all the
    * way down. */
  def dsirServeCounts(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = DefaultBuckets): DataFrame = {
    requireMeta(spark, dir, numBuckets)
    val rawC = Models.load(spark, s"$dir/raw_counts")
      .groupBy("bucket").agg(sum(col("nr")).as("nr"))
    val tgtC = Models.load(spark, s"$dir/target_counts")
      .groupBy("bucket").agg(sum(col("nt")).as("nt"))
    dsirWeightsWithN(docs, modelOfCounts(spark, rawC, tgtC, numBuckets),
      idCol, textCol, numBuckets)
  }

  /** Gumbel top-k selection over fitted weights: key = logw + g where
    * g = −ln(−ln(u)) and u is the md5-uniform of "dsirg:" || id — exact
    * sampling without replacement proportional to exp(logw) (Vieira 2014,
    * "Gumbel-max trick"), deterministic under the seeding contract.
    * The key stays in decimal until the final projection so both engines
    * order identical values; ties (impossible in practice) break by id.
    * TakeOrderedAndProject: no global sort at any corpus size. */
  def dsirResample(weights: DataFrame, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val u = (conv(substring(md5(concat(lit("dsirg:"),
      col(idCol).cast("string"))), 1, 4), 16, 10).cast("double") + 0.5) / 65536.0
    val g = -log(-log(u))
    weights
      .withColumn("__key", col("__lw") + g.cast(dec))
      .orderBy(desc("__key"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("n_grams"), col("dsir_logw"),
        col("__key").cast("double").as("sel_key"))
  }
}
