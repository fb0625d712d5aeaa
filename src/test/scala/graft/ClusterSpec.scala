package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Cluster, Quantize, Sampling}

/** Behavioral tests for the embedding-clustering / quantization operators:
  * k-means must be deterministic and actually cluster (planted tight groups
  * end up together), SemDeDup must drop exactly the planted intra-cluster
  * near-dups, int8 quantization must round-trip within the step bound.
  */
class ClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  lazy val emb: DataFrame =
    graft.queries.T.embeddings(spark, "/root/testdata/sf0.001")

  /** Fixture embeddings plus a planted near-copy of vec 3 (one component
    * nudged): cosine vs the original is ~1, far above any fixture pair. */
  lazy val embWithDup: DataFrame = {
    val dup = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") + 10000).as("vec_id"),
        // pure scaling preserves direction exactly — cosine vs the
        // original is 1 up to float rounding, so assignment can't flip
        transform(col("embedding"),
          x => x * lit(1.001f)).as("embedding"),
        col("label"))
    emb.unionByName(dup)
  }

  test("kmeans assignment is deterministic across reruns and repartitionings") {
    val a1 = Cluster.kmeansAssign(emb, k = 4, iters = 2)
      .orderBy("vec_id").as[(Long, Int)].collect()
    val a2 = Cluster.kmeansAssign(emb.repartition(7), k = 4, iters = 2)
      .orderBy("vec_id").as[(Long, Int)].collect()
    assert(a1.sameElements(a2))
    assert(a1.length == emb.count())
  }

  test("kmeans puts a planted near-copy in its original's cluster") {
    val a = Cluster.kmeansAssign(embWithDup, k = 4, iters = 2)
      .filter(col("vec_id").isin(3L, 10003L))
      .select("cluster").as[Int].collect()
    assert(a.length == 2 && a(0) == a(1))
  }

  test("kmeans iterations reduce (never increase) mean assignment distance") {
    def meanBestCos(iters: Int): Double = {
      val a = Cluster.kmeansAssign(emb, k = 4, iters = iters)
      val cents = Cluster.updateCentroids(
        emb.select(col("vec_id"), col("embedding")), a)
      // mean cosine to own centroid — higher is tighter
      emb.join(a, "vec_id").join(cents, "cluster")
        .select(graft.expr.VecExprs.cosineSim(col("embedding"), col("c")).as("cos"))
        .agg(avg("cos")).as[Double].head()
    }
    assert(meanBestCos(3) >= meanBestCos(1) - 1e-9)
  }

  test("semDedup drops the planted near-copy and keeps the original") {
    val r = Cluster.semDedup(embWithDup, minCos = 0.9, k = 4, iters = 2)
    val dropped = r.filter(!col("kept")).select("vec_id").as[Long].collect().toSet
    assert(dropped.contains(10003L), s"planted copy not dropped: $dropped")
    assert(!dropped.contains(3L), "keep-the-minimum rule must keep the original")
  }

  test("int8 quantization reconstructs every element within half a step") {
    val stats = Quantize.sqStats(emb)
    val maxStep = stats
      .select(((col("mx") - col("mn")) / 255.0).as("step"))
      .agg(max("step")).as[Double].head()
    val maxErr = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .join(broadcast(stats), "pos")
      .select(col("vec_id"), col("pos"), col("v").cast("double").as("v"),
        col("mn"), col("mx"))
      .join(Quantize.sqQuantize(emb).select("vec_id", "recon_err"), "vec_id")
      .agg(max("recon_err")).as[Double].head()
    // per-vector error sums 64 elements, each bounded by step/2
    assert(maxErr <= 64 * maxStep / 2 + 1e-6,
      s"recon_err $maxErr exceeds bound ${64 * maxStep / 2}")
  }

  test("quantization codes are stable under repartitioning") {
    val h1 = Quantize.sqQuantize(emb).orderBy("vec_id")
      .select("code_hash").as[String].collect()
    val h2 = Quantize.sqQuantize(emb.repartition(5)).orderBy("vec_id")
      .select("code_hash").as[String].collect()
    assert(h1.sameElements(h2))
  }

  test("weightedKeep is monotone: raising the weight never drops a kept row") {
    val base = spark.range(1000).select(col("id").as("doc_id"),
      (col("id") % 10).cast("double").divide(10.0).as("quality_score"))
    val low = Sampling.weightedKeep(base)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    val high = Sampling.weightedKeep(
      base.withColumn("quality_score", col("quality_score") + 0.3))
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high))
  }

  test("pq codes: deterministic under repartitioning, colinear copy gets identical codes") {
    val c1 = Quantize.pqEncode(embWithDup, m = 4, subDim = 16, k = 4, iters = 2)
      .orderBy("vec_id").collect()
    val c2 = Quantize.pqEncode(embWithDup.repartition(7), m = 4, subDim = 16, k = 4, iters = 2)
      .orderBy("vec_id").collect()
    assert(c1.sameElements(c2), "pq codes changed under repartitioning")
    val byId = c1.map(r => r.getLong(0) -> r.toSeq.tail).toMap
    // scaling preserves per-subspace cosine argmax: the planted copy of
    // vec 3 must land in the same cell of every sub-codebook
    assert(byId(3L) == byId(10003L),
      s"colinear copy coded differently: ${byId(3L)} vs ${byId(10003L)}")
  }

  test("pq fit fails fast when m*subDim exceeds the embedding width") {
    // before the guard, slice() past the end yielded short/empty subvectors
    // and the fit "succeeded" with degenerate codes — silent quality bug
    val e = intercept[Exception] {
      // 64-dim vectors, m=8 x subDim=16 = 128 required
      Quantize.pqEncode(emb, m = 8, subDim = 16, k = 4, iters = 1).collect()
    }
    def msgOf(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgOf(e).contains("shorter than m*subDim"), msgOf(e))
  }

  test("pq ADC topk returns a full, distinct ranking per query") {
    val top = Quantize.pqTopK(emb, Seq(0L, 1L), kNN = 5, m = 4, subDim = 16,
      k = 4, iters = 2).collect()
    assert(top.length == 10)
    val byQ = top.groupBy(_.getLong(0))
    for ((q, rows) <- byQ) {
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 5), s"ranks broken for $q")
      assert(rows.map(_.getLong(2)).distinct.length == 5, s"dup neighbors for $q")
      assert(!rows.map(_.getLong(2)).contains(q), s"query $q returned itself")
    }
  }

  test("ivf-pq with full-coverage nprobe equals plain pq-adc") {
    // when every label is probed the candidate set is the whole corpus
    // minus self, so the routed variant must reproduce the brute ADC
    // ranking exactly — pins that routing only FILTERS, never re-scores
    val nLabels = emb.select("label").distinct().count().toInt
    val full = Quantize.ivfPqTopK(emb, Seq(0L, 1L, 2L), kNN = 5,
        nprobe = nLabels, m = 4, subDim = 16, k = 4, iters = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val brute = Quantize.pqTopK(emb, Seq(0L, 1L, 2L), kNN = 5, m = 4,
        subDim = 16, k = 4, iters = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(full == brute, s"routed != brute:\n$full\nvs\n$brute")
    // nprobe=1 returns a full distinct ranking from the probed list only
    val one = Quantize.ivfPqTopK(emb, Seq(0L), kNN = 5, nprobe = 1,
      m = 4, subDim = 16, k = 4, iters = 2).collect()
    assert(one.length == 5 && one.map(_.getLong(2)).distinct.length == 5)
  }

  test("semdedup scale knob: k scaled with the corpus bounds per-cluster pair volume") {
    // The SemDeDup pair stage is quadratic ONLY inside a cluster. The
    // scaling contract (Cluster scaladoc) is that growing k in proportion
    // to the corpus keeps the per-cluster candidate volume bounded — this
    // measures it at two real scales with the same n/k ratio (62.5).
    def pairStats(dir: String, k: Int): (Long, Long, Double) = {
      val e = graft.queries.T.embeddings(spark, dir)
      val sizes = Cluster.kmeansAssign(e, k = k, iters = 3)
        .groupBy("cluster").count().select("count").as[Long].collect()
      val pairs = sizes.map(c => c * (c - 1) / 2).sum
      (sizes.max, pairs, pairs.toDouble / k)
      // (largest cluster, total intra-cluster pairs, mean pairs/cluster)
    }
    val (max001, pairs001, mean001) = pairStats("/root/testdata/sf0.01", 8)
    val (max01, pairs01, mean01) = pairStats("/root/testdata/sf0.1", 32)
    info(f"sf0.01 n=500  k=8:  max cluster $max001%d, pairs $pairs001%d, mean/cluster $mean001%.0f")
    info(f"sf0.1  n=2000 k=32: max cluster $max01%d, pairs $pairs01%d, mean/cluster $mean01%.0f")
    // bounded: mean per-cluster pair volume must not grow with the corpus
    // beyond cluster-balance noise (unbounded would be ~16x here: (4n)^2/4k)
    assert(mean01 <= 3 * mean001,
      f"per-cluster pair volume grew $mean001%.0f -> $mean01%.0f despite k scaling")
    // and the pair stage must stay far below all-pairs at the larger scale
    val allPairs = 2000L * 1999 / 2
    assert(pairs01.toDouble / allPairs < 0.2,
      s"pair stage scanned ${pairs01}/$allPairs of all pairs")
  }
}
