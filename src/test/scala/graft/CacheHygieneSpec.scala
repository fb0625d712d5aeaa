package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle contract: operators may pin intermediates while they
  * run, but (a) iterative loops must release superseded pins as they go,
  * (b) a finished query leaves at most a small bounded set of persisted
  * tables (its documented result/intermediate handles), and (c) the
  * per-query clearState that Bench/Verify run between queries empties the
  * JVM completely. Round 5 showed what happens otherwise: leaked pins
  * compounding across a single-JVM bench inflated UNRELATED later queries
  * 2-7x.
  */
class CacheHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def clearState(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("cache-heavy queries leave a bounded persisted footprint; clearState empties it") {
    val cacheHeavy = Seq("q_graph_pagerank", "q_ns_kmeans", "q_ns_semdedup",
      "q_ns_dedup_corpus", "q_ret_bm25_topk", "q_ns_dedup_components",
      "q_graph_reach_cte", "q_ns_dedup_corpus_clustered",
      "q_ns_dedup_incremental", "q_ns_dedup_minhash", "q_ns_pq_topk",
      "q_ns_bpe_tokenize")
    for (name <- cacheHeavy) {
      clearState()
      queries.Registry.byName(name).fn(spark, sf).count()
      val persisted = spark.sparkContext.getPersistentRDDs.size
      assert(persisted <= 4,
        s"$name left $persisted persisted RDDs — leaked intermediates?")
      clearState()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$name: clearState did not empty the persistent-RDD registry")
    }
  }

  test("pageRank releases every intermediate — only the result table survives") {
    import spark.implicits._
    clearState()
    // iters > pinEvery exercises the mid-loop pin-and-release path too
    val edges = (0L until 40L).map(i => (i, (i * 7 + 1) % 40))
      .toDF("src", "dst")
    ops.Graph.pageRank(edges, iters = 7).count()
    val persisted = spark.sparkContext.getPersistentRDDs.size
    assert(persisted <= 1,
      s"pageRank left $persisted persisted RDDs; expected only its result")
    clearState()
  }

  test("kmeans releases superseded centroid pins — at most the final pin survives") {
    clearState()
    val emb = queries.T.embeddings(spark, sf)
    ops.Cluster.kmeansAssign(emb, k = 4, iters = 4).count()
    val persisted = spark.sparkContext.getPersistentRDDs.size
    assert(persisted <= 1,
      s"kmeans left $persisted persisted RDDs; expected only the last centroid pin")
    clearState()
  }
}
