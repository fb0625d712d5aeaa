package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Scale design (the 100 TB contract):
  *  - Exact dedup groups by a 256-bit content digest, so the shuffle carries
  *    32 bytes + id per row instead of full document text.
  *  - MinHash/LSH is the classic shingle → signature → banded-bucket-join
  *    pipeline: per-row signature computation is embarrassingly parallel,
  *    and the only shuffle is on (band, bucket_key) — candidate pairs are
  *    generated per-bucket, never all-pairs.
  *  - SimHash buckets on a 16-bit prefix; the quadratic pair check runs
  *    only inside a bucket.
  *  - All hashing is Spark's codegen'd xxhash64 — no UDFs anywhere.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content digest with the
    * survivor id (min) and the number of copies. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Lower-cased whitespace word array. */
  def words(textCol: String): Column = split(lower(trim(col(textCol))), "\\s+")

  /** Word n-gram shingle array (distinct), built with array lambdas —
    * no explode, no UDF. */
  def shingleExpr(n: Int): String =
    s"""array_distinct(transform(
       |  sequence(1, greatest(size(w) - ${n - 1}, 0)),
       |  i -> array_join(slice(w, i, $n), ' ')))""".stripMargin

  /** docs + `shingles` column of word n-grams. */
  def withShingles(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    docs.withColumn("w", words(textCol))
      .withColumn("shingles", expr(shingleExpr(n)))
      .drop("w")

  /** 64-slot MinHash signature over the shingle array. Each slot hashes the
    * shingle together with the slot index (seeded-hash idiom) and takes the
    * min — one pass over the array per slot, all inside codegen. */
  val signatureExpr: String =
    """transform(sequence(0, 63),
      |  j -> array_min(transform(shingles, s -> xxhash64(s, j))))""".stripMargin

  /** MinHash-LSH candidate pairs: signatures banded into `bands` bands of
    * `rows` slots; docs sharing any band bucket become candidates and are
    * verified with exact shingle-set Jaccard. Returns (doc_a, doc_b,
    * jaccard) with doc_a < doc_b. */
  def minHashCandidates(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, bands: Int = 16, rows: Int = 4): DataFrame = {
    require(bands * rows == 64, "bands*rows must equal the 64-slot signature")
    val sig = withShingles(docs, textCol, shingleN)
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", expr(signatureExpr))
      .select(col("doc_id"), col("shingles"), col("sig"))
    // one row per (doc, band): bucket key = hash of the band's slice
    val banded = sig.select(
      col("doc_id"), col("shingles"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))"))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash: per-word xxhash64, signed bit-vote per bit position,
    * assembled into one long. Explode → 64 conditional sums → bit OR fold. */
  def simHash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val hashed = docs
      .select(col("doc_id"), explode(words(textCol)).as("word"))
      .filter(col("word") =!= "")
      .select(col("doc_id"), xxhash64(col("word")).as("h"))
    val votes = (0 until 64).map { j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sim = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup candidate count per doc: bucket on the top-16-bit
    * prefix, pair within buckets, keep Hamming distance <= maxHamming. */
  def simHashNearDups(docs: DataFrame, textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val sh = simHash(docs, textCol)
      .withColumn("bucket", expr("simhash >> 48"))
    val a = sh.select(col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = sh.select(col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b") &&
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= maxHamming)
    sh.select(col("doc_id"), col("simhash"))
      .join(
        pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_near")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_near"))
  }

  /** Exact n-gram Jaccard best-match per doc, blocked by word-count band so
    * the pair space is per-block quadratic, not global (near-dups almost
    * always land in the same or an adjacent length band at high τ). */
  def ngramJaccardBestMatch(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, blockWidth: Int = 16): DataFrame = {
    val sh = withShingles(docs, textCol, shingleN)
      .filter(size(col("shingles")) > 0)
      .withColumn("block", (size(col("shingles")) / blockWidth).cast("int"))
      .select("doc_id", "block", "shingles")
    val a = sh.select(col("block"), col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("block"), col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val pairs = a.join(b, Seq("block"))
      .filter(col("doc_a") =!= col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_a")
      .orderBy(col("jaccard").desc, col("doc_b").asc)
    pairs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("best_match_id"),
        col("jaccard").as("best_jaccard"))
  }
}
