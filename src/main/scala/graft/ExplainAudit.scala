package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of any registered queries —
  * `sbt "runMain graft.ExplainAudit q_ns_sim_ivf_topk ..."`. The per-round
  * plan review ("is this the plan you'd want at 100 TB, not just the first
  * one that passed") runs through this; the load-bearing plan properties
  * graduate into PlanSpec assertions. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args) {
      val df = graft.queries.Registry.byName(n).fn(spark, sfDir)
      println(s"===== $n =====")
      // the same typed live-exchange count PlanSpec's budget gate uses,
      // so new budgets are measured with the gate's own ruler
      val ep = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case o => o
      }
      val sh = ep.collect {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      }.size
      val bc = ep.collect {
        case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => 1
      }.size
      println(s"live_exchanges: shuffles=$sh broadcasts=$bc")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // operator tree only by default (the formatted mode appends
      // per-node details); SPARK_GRAFT_EXPLAIN_FULL=1 prints everything
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_FULL")) println(p)
      else p.linesIterator.takeWhile(_.nonEmpty).foreach(println)
    }
    spark.stop()
  }
}
