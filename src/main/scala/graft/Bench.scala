package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Headline benchmark set: one representative per operator family
    * (scan/agg/join/window/set/sort + the north-star dedup, ANN, text, and
    * streaming-shaped ops). The full 64-query registry still runs under the
    * correctness gate (Verify); set SPARK_GRAFT_BENCH_ALL=1 to time all of
    * them here too. */
  val headline: Seq[String] = Seq(
    "q_s1_scan_prune",
    "q_a1_agg_pricing",
    "q_a6_count_distinct",
    "q_j2_join_agg_datediff",
    "q_j5_theta_join",
    "q_j7_asof_join",
    "q_w2_top1_per_group",
    "q_w7_gaps_islands",
    "q_u1_unpivot_union",
    "q_o1_multisort_topk",
    "q_ns_dedup_exact",
    "q_ns_dedup_minhash",
    "q_ns_sim_brute_topk",
    "q_ns_text_quality",
    "q_stream_tumbling_window")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-footer warmup so per-query timings measure the
    // query, not first-touch JIT and classloading
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val all = SparkEntry.queries
    val names =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) all.keys.toSeq.sorted
      else headline.filter(all.contains)
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { all(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
