package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Off-script scale-up evidence: synthesizes a 10x corpus from sf0.1 and
  * runs the headline dedup + ANN-blocking paths at both sizes, printing
  * per-scale candidate volumes and wall times (recorded in SCALING.md).
  * The point is to demonstrate the scaling CONTRACTS hold outside the
  * benchmarked sizes: near-dup candidate volume grows with near-dup
  * density (linear here, by construction), not quadratically with corpus
  * size; and LSH bucket occupancy is held flat by the nbits knob, the
  * same way IVF holds probe-list size flat with k ∝ corpus.
  *
  * Replica construction keeps duplicate DENSITY constant at 10x:
  * - documents: every word in replica k is prefixed `r<k>_`, so each
  *   replica reproduces sf0.1's intra-replica near-dup structure exactly
  *   while sharing zero shingles across replicas (naively concatenating
  *   10 copies would give every doc 9 exact dups — a different corpus).
  * - embeddings: replica k multiplies dimension d by sign(md5(k, d)).
  *   A diagonal +-1 transform preserves all intra-replica inner products
  *   (D^2 = I), so each replica has sf0.1's neighbor structure, while
  *   cross-replica cosines are scrambled.
  *
  * Usage: `sbt "runMain graft.ScaleEvidence"` (SPARK_GRAFT_CPUS to size
  * the local master; /tmp/graft_scale10 holds the synthesized parquet).
  */
object ScaleEvidence {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "/tmp/graft_scale10"
    val reps = 10

    // ---- synthesize the 10x corpora (written to parquet so the measured
    // runs pay honest scan costs, same as the 1x baseline)
    val docs = queries.T.documents(spark, sfDir)
    (0 until reps).map { k =>
      docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"r${k}_$$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = queries.T.embeddings(spark, sfDir)
    (0 until reps).map { k =>
      emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        expr(s"""transform(embedding, (x, d) ->
             |  CASE WHEN substring(md5(concat('sf', '$k', ':', d)), 1, 1) < '8'
             |       THEN x ELSE float(-x) END)""".stripMargin)
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    def docsAt(scale: String): DataFrame =
      if (scale == "1x") docs
      else spark.read.parquet(s"$out/documents.parquet")
    def embAt(scale: String): DataFrame =
      if (scale == "1x") emb
      else spark.read.parquet(s"$out/embeddings.parquet")

    def clear(): Unit = {
      ops.Pins.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    for (scale <- Seq("1x", "10x")) {
      val d = docsAt(scale)
      val nDocs = d.count()

      // headline near-dup path: candidate volume must scale with near-dup
      // density (linear by construction), never quadratically with corpus
      clear()
      val (candStats, tCand) = timed {
        val cand = ops.Neutral.minHashCandidates(d)
        cand.agg(count(lit(1)).as("pairs"),
            sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("verified"))
          .head()
      }
      // full clustered dedup end-to-end (exact -> pairs -> components ->
      // one survivor per component)
      clear()
      val (keptRows, tDedup) = timed {
        ops.Neutral.dedupCorpusClustered(d).count()
      }
      println(s"""SCALE10 {"scale":"$scale","n_docs":$nDocs,""" +
        s""""cand_pairs":${candStats.getLong(0)},"verified_pairs":${candStats.getLong(1)},""" +
        s""""t_candidates_s":${"%.2f".format(tCand)},""" +
        s""""dedup_kept":$keptRows,"t_dedup_clustered_s":${"%.2f".format(tDedup)}}""")

      // exact-substring span detection: the occurrence stream is one row
      // per token position, but marked volume must track true duplication
      // — replicas are vocabulary-disjoint, so 10x corpus => ~10x spans
      // with per-gram group sizes unchanged (no cross-replica collisions)
      clear()
      val (spanStats, tSpan) = timed {
        ops.Dedup.duplicatedSpans(d)
          .agg(count(lit(1)).as("n_spans"),
            coalesce(sum("span_tokens"), lit(0L)).as("dup_tokens"))
          .head()
      }
      println(s"""SCALE10 {"scale":"$scale","n_spans":${spanStats.getLong(0)},""" +
        s""""dup_tokens":${spanStats.getLong(1)},"t_spans_s":${"%.2f".format(tSpan)}}""")

      // ANN blocking: per-bucket occupancy. At 10x with the SAME nbits the
      // buckets hold ~10x the vectors (bucket space is fixed at
      // tables * 2^nbits); raising nbits by ~log2(10) restores flat
      // occupancy — the LSH analogue of IVF's k ∝ corpus rule.
      val e = embAt(scale)
      for (nbits <- if (scale == "1x") Seq(8) else Seq(8, 11)) {
        clear()
        val (occ, tOcc) = timed {
          e.select(col("vec_id"),
              posexplode(ops.Neutral.lshBuckets(col("embedding"), nbits, 4))
                .as(Seq("t", "bucket")))
            .groupBy("t", "bucket").agg(count(lit(1)).as("n"))
            .agg(count(lit(1)).as("n_buckets"), avg("n").as("avg_occ"),
              max("n").as("max_occ"))
            .head()
        }
        println(s"""SCALE10 {"scale":"$scale","nbits":$nbits,""" +
          s""""n_buckets":${occ.getLong(0)},"avg_occ":${"%.1f".format(occ.getDouble(1))},""" +
          s""""max_occ":${occ.getLong(2)},"t_bucket_s":${"%.2f".format(tOcc)}}""")
      }
    }
    spark.stop()
  }
}
