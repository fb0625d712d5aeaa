package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Headline benchmark set: one representative per operator family
    * (scan/agg/join/window/set/sort + the north-star dedup, ANN, text, and
    * streaming-shaped ops, plus the skew-salting demonstration pair). The
    * full registry still runs under the correctness gate (Verify); set
    * SPARK_GRAFT_BENCH_ALL=1 to time all of it here too. */
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
    "q_ns_dedup_cosine",
    "q_ns_dedup_corpus",
    "q_ns_sim_brute_topk",
    "q_ns_sim_ivf_topk",
    "q_ns_text_quality",
    "q_stream_tumbling_window",
    "q_scale_skew_plain",
    "q_scale_salted_join",
    // round-3 families: retrieval, graph, stream-stream join, lifecycle
    "q_ret_bm25_topk",
    "q_graph_pagerank",
    "q_stream_join_attrib",
    "q_e_scd2",
    // round-5 families: iterative clustering + semantic dedup, quantization
    "q_ns_semdedup",
    "q_ns_embed_quantize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // experiment knob for the skew pair: AQE's runtime skew split vs
      // explicit salting (SCALING.md records both)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-footer warmup so per-query timings measure the
    // query, not first-touch JIT and classloading
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val all = SparkEntry.queries
    val names =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) all.keys.toSeq.sorted
      else headline.filter(all.contains)
    var errors = List.empty[String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { all(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => errors ::= name; false }
      // a crashed query is flagged with negative time, never folded into total
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a well-known file: the driver's parser must not depend
    // on stdout surviving sbt/log4j decoration.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
