package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted model artifacts: the fit/apply split for the
  * learned-parameter operators (PQ codebooks, IVF coarse centroids,
  * k-means centroids, BPE merges).
  *
  * The anti-pattern this removes: an operator like ivfPqTopK that refits
  * its codebooks inside the serving query re-pays the whole Lloyd
  * iteration — the part that scans the full corpus — on every top-k
  * batch. At 10^9 vectors the fit dominates serving by orders of
  * magnitude. The correct lifecycle is the one every ANN system ships:
  * fit ONCE into a durable artifact (here: plain parquet directories —
  * readable by any engine, partition-parallel, no custom format), then
  * serve any number of query batches from the loaded artifact. Because
  * every fit in this library is bit-deterministic (md5 seeds, decimal
  * means, fixed tie-breaks), a rebuilt artifact is byte-identical to the
  * original — loading is purely a cost optimization, never a semantics
  * change, which is what lets a served query share its oracle with the
  * refitting form.
  *
  * [[save]]/[[load]]/[[exists]] work on any Hadoop-visible path (local
  * fs in tests, HDFS/object store at scale). [[ensureBuilt]] is the
  * in-JVM memoization the bench/verify harness uses: first caller builds
  * into a fresh temp dir, every later caller (and bench rep) serves from
  * it — exactly the build-once/serve-many shape, without any risk of a
  * stale artifact outliving the JVM's dataset.
  */
object Models {

  /** Persist one model table (overwrite — a fitted artifact is replaced
    * atomically per path; the one append-shaped artifact is the dedup
    * admission index, via [[append]]). */
  def save(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** Generation ledger: each artifact build/append stamps one
    * (gen, batch_id) row under `$dir/gens` — the lifecycle metadata the
    * dataset card's freshness section reads ([[genStats]]): how many
    * file-set generations a serving scan pays for (the compaction-cadence
    * signal) and which ingest batch the artifact last saw (the staleness
    * signal). `batchId` < 0 means "sequential": the ledger assigns
    * gen-count order — streaming folds pass their real micro-batch id
    * instead. The ledger is itself one tiny appended table; build passes
    * overwrite it back to one row. */
  def logGen(spark: SparkSession, dir: String, batchId: Long = -1L,
      fresh: Boolean = false): Unit = {
    import spark.implicits._
    val path = s"$dir/gens"
    val nPrior =
      if (fresh) 0L
      else try load(spark, path).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    val id = if (batchId >= 0) batchId else nPrior
    val row = Seq((nPrior, id)).toDF("gen", "batch_id")
    if (fresh) save(row, path) else append(row, path)
  }

  /** Fold the ledger after a compaction: the artifact is ONE generation
    * again, but the last-seen batch id is preserved (compaction changes
    * layout, not content). */
  def resetGens(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val path = s"$dir/gens"
    val last =
      try {
        val r = load(spark, path)
          .agg(org.apache.spark.sql.functions.max("batch_id")).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      } catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    save(Seq((0L, last)).toDF("gen", "batch_id"), path)
  }

  /** The freshness row the card reads: generation count + last batch id. */
  def genStats(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    load(spark, s"$dir/gens").agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_generations"),
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("batch_id")).as("last_batch_id"))

  /** Generation swap: replace the live artifact directory with a freshly
    * written one (delete live, rename tmp into its place). Parquet cannot
    * overwrite a directory that is also being read, so maintenance passes
    * (posting compaction, …) write a NEW directory from the old one and
    * swap — the pattern a real table format wraps in a metadata commit;
    * here the swap is the two filesystem ops, and a crash between them
    * loses only the rewrite (the source generations were already folded
    * into tmp, which survives under its tmp name for manual recovery). */
  def swapIn(spark: SparkSession, tmpDir: String, liveDir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(liveDir)
    val tmp = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(live, true)
    require(fs.rename(tmp, live),
      s"generation swap failed: $tmpDir -> $liveDir")
  }

  /** Append a delta to an existing artifact table — only for artifacts
    * whose consumers are multiplicity-insensitive (the dedup index's
    * digest/signature tables, read via anti/semi joins: Neutral
    * .dedupIndexAppend). A fitted model (centroids, codebooks, merges)
    * must never be appended — rebuild and [[save]] instead. */
  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  /** Persist with Hive-style directory partitioning on `cols` — for
    * artifact tables whose serving access pattern is an equi join or
    * filter on those columns (the IVF inverted lists): a probe then
    * reads ONLY the probed partitions' files (static pushdown for
    * literal filters, dynamic partition pruning for broadcast joins)
    * instead of scanning the corpus-sized table. */
  def savePartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(dir)

  /** [[append]] for a [[savePartitioned]] artifact — deltas land inside
    * the matching partition directories, so pruning holds across append
    * generations. */
  def appendPartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.mode("append").partitionBy(cols: _*).parquet(dir)

  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** True iff a completed save exists at `dir` (the _SUCCESS marker —
    * a torn write never serves). */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(p, "_SUCCESS"))
  }

  private val built = new ConcurrentHashMap[String, String]()

  /** Build-once-per-JVM: the first call for `key` runs `build` against a
    * fresh temp directory and returns it; later calls return the same
    * directory without building. Keyed per (operator, dataset, params) by
    * the caller. Temp-dir scoped so an artifact can never outlive the JVM
    * and serve a different dataset generation. */
  def ensureBuilt(key: String)(build: String => Unit): String =
    built.computeIfAbsent(key, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_model_")
        .toString
      build(dir)
      dir
    })
}
