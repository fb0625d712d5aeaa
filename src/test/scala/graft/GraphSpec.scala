package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** Behavioral PageRank tests on hand-built graphs with known structure. */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("star graph: the hub everyone links to dominates") {
    // leaves 1..5 <-> hub 0 in both directions: hub concentrates 5 in-edges,
    // each leaf gets 1/5 of the hub's mass — hub is max at every iteration
    val edges = ((1 to 5).map(i => (i.toLong, 0L)) ++ (1 to 5).map(i => (0L, i.toLong)))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(pr(0L) == pr.values.max, "hub must hold the top score")
    assert(pr(0L) > 2 * pr(1L), "hub concentrates well above any leaf")
    assert(pr(1L) == pr(2L) && pr(2L) == pr(5L), "symmetric leaves tie")
    val mass = pr.values.sum
    assert(mass > 0.9 && mass <= 1.000001, s"mass ~conserved, got $mass")
  }

  test("cycle graph: perfect symmetry gives uniform scores") {
    val n = 4
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 8).collect()
      .map(_.getDecimal(1).doubleValue()).toSeq
    assert(pr.forall(s => math.abs(s - 0.25) < 1e-6), s"uniform 1/n, got $pr")
  }

  test("triangle counts: known graph, duplicate/reversed edges collapse") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant node 5
    // attached to 1 (in no triangle) — fed with duplicates and reversals
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (4L, 3L), (1L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"expected each K4 node in 3 triangles, pendant absent: $got")
    // global count: sum of per-node counts = 3 * n_triangles
    assert(got.values.sum == 3 * 4)
  }
}
