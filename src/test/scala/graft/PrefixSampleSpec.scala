package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SampleQuantile, ScaleOps}

/** Round-10 additions: the two-pass distributed prefix aggregation (vs the
  * naive single-partition global window), the sweep-line/interval-bucket
  * operators built on it, and the bottom-k-sample quantile sketch's
  * union algebra + artifact lifecycle.
  */
class PrefixSampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def events: DataFrame =
    queries.T.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)

  test("prefixSum equals the naive global-window running sum") {
    val pts = events.select(col("ts").as("t"),
      (col("user_id") % 7 - 3).cast("long").as("d"),
      col("event_id")) // unique tie-break => total order
    val order = Seq(col("t"), col("d"), col("event_id"))
    val naive = pts.withColumn("c",
        sum(col("d")).over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(order: _*).select("event_id", "c").collect().toSeq
    val fast = ScaleOps.prefixSum(pts, to_date(col("t")), order,
        col("d"), "c")
      .orderBy(order: _*).select("event_id", "c").collect().toSeq
    assert(fast == naive)
  }

  test("prefixMax (strict) equals the naive strictly-preceding running max") {
    val pts = events.select(col("ts").as("t"), col("value").as("v"),
      col("event_id"))
    val order = Seq(col("t"), col("event_id"))
    val naive = pts.withColumn("m",
        max(col("v")).over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .orderBy(order: _*).select("event_id", "m").collect().toSeq
    val fast = ScaleOps.prefixMax(pts, to_date(col("t")), order,
        col("v"), "m", strict = true)
      .orderBy(order: _*).select("event_id", "m").collect().toSeq
    assert(fast == naive)
    assert(naive.head.isNullAt(1)) // global first row has no predecessor
  }

  test("prefix aggregation's only unpartitioned window is over the bucket " +
      "totals, not the data") {
    val pts = events.select(col("ts").as("t"), col("event_id"),
      lit(1L).as("d"))
    val plan = ScaleOps.prefixSum(pts, to_date(col("t")),
        Seq(col("t"), col("event_id")), col("d"), "c")
      .queryExecution.optimizedPlan
    // the unpartitioned window's child must aggregate down to bucket rows
    val globalWindows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.nonEmpty)
    globalWindows.foreach { w =>
      val aggBelow = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggBelow.nonEmpty,
        s"unpartitioned window runs over raw data:\n$w")
    }
  }

  test("concurrencySweep equals the naive global sweep, and a planted " +
      "midnight-crossing overlap counts on both days' points") {
    val iv = events.select(col("ts").as("s0"),
      (col("ts") + expr("make_interval(0,0,0,0,0,30,0)")).as("e0"))
    val naivePts = iv.select(col("s0").as("t"), lit(1).as("d"))
      .unionByName(iv.select(col("e0").as("t"), lit(-1).as("d")))
    val naive = naivePts.withColumn("c",
        sum(col("d")).over(Window.orderBy(col("t"), col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(to_date(col("t")).as("day"))
      .agg(max(col("c")).as("max_concurrent"))
      .orderBy("day").collect().toSeq
    val fast = ScaleOps.concurrencySweep(iv, "s0", "e0")
      .orderBy("day").collect().toSeq
    assert(fast == naive)
  }

  test("concurrencySweep: planted half-open intervals — an end meeting a " +
      "start at the same instant does not overlap") {
    import spark.implicits._
    // [0,10) and [10,20) back-to-back: max 1; [5,15) overlaps both: max 2
    val iv = Seq(
      ("2024-01-01 00:00:00", "2024-01-01 00:10:00"),
      ("2024-01-01 00:10:00", "2024-01-01 00:20:00"))
      .toDF("s", "e")
      .select(col("s").cast("timestamp").as("s0"),
        col("e").cast("timestamp").as("e0"))
    val r1 = ScaleOps.concurrencySweep(iv, "s0", "e0").collect()
    assert(r1.map(_.getLong(1)).max == 1L)
    val iv2 = iv.unionByName(Seq(("2024-01-01 00:05:00",
        "2024-01-01 00:15:00")).toDF("s", "e")
      .select(col("s").cast("timestamp").as("s0"),
        col("e").cast("timestamp").as("e0")))
    val r2 = ScaleOps.concurrencySweep(iv2, "s0", "e0").collect()
    assert(r2.map(_.getLong(1)).max == 2L)
  }

  test("intervalBucketJoin equals the declarative BETWEEN join and plans " +
      "no cartesian product") {
    val points = queries.T.lineitem(spark, sf)
      .filter(col("l_extendedprice").isNotNull).select("l_extendedprice")
    val ranges = queries.T.orders(spark, sf)
      .filter(col("o_totalprice").isNotNull)
      .select(col("o_orderkey"), (col("o_totalprice") / 4.0).as("lo"))
      .withColumn("hi", col("lo") * 1.01)
    val bucketed = ScaleOps.intervalBucketJoin(points, "l_extendedprice",
      ranges, "lo", "hi", bucketWidth = 1000.0)
    val naive = points.join(ranges,
      col("l_extendedprice") >= col("lo") &&
        col("l_extendedprice") <= col("hi"))
    def key(df: DataFrame): Seq[(Long, Double)] = df
      .select(col("o_orderkey"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(key(bucketed) == key(naive))
    assert(naive.count() > 0) // the equality is not vacuous
    val phys = bucketed.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      "bucketed interval join must not plan a cartesian product")
    assert(!phys.contains("BroadcastNestedLoopJoin"))
  }

  test("skyline3d equals the naive quadratic NOT EXISTS, including " +
      "duplicate-triple and z-tie boundary cases") {
    import spark.implicits._
    // events-derived points plus planted edge cases: an exact duplicate
    // pair (both must survive if undominated) and a z-tie across cells
    // (strict-x dominance must still prune)
    val base = events.select(col("event_id").cast("long").as("id"),
      col("value").as("x"),
      (col("user_id") % 223).cast("long").as("y"),
      (col("event_id") % 97).cast("long").as("z"))
    // planted at minimal y/z so they join the skyline via x alone without
    // dominating the corpus points (which keeps the test's skyline mixed)
    val planted = Seq(
      (900001L, 1e9, 0L, 0L), // skyline via max x
      (900002L, 1e9, 0L, 0L), // its exact duplicate — both survive
      (900003L, 0.5e9, 0L, 0L) // ties y and z but strictly loses on x
    ).toDF("id", "x", "y", "z")
    val pts = base.unionByName(planted)
    val got = ScaleOps.skyline3d(pts, "id", wx = 1e7, wy = 10.0)
      .select("id").collect().map(_.getLong(0)).toSet
    val p = pts.alias("b")
    val naive = p.join(pts.alias("a"),
        col("a.x") >= col("b.x") && col("a.y") >= col("b.y") &&
          col("a.z") >= col("b.z") &&
          (col("a.x") > col("b.x") || col("a.y") > col("b.y") ||
            col("a.z") > col("b.z")),
        "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == naive,
      s"grid skyline diverges from naive: extra=${got -- naive} " +
        s"missing=${naive -- got}")
    assert(got.contains(900001L) && got.contains(900002L),
      "duplicate-coordinate skyline points must both survive")
    assert(!got.contains(900003L),
      "a strictly dominated tie point must be pruned")
    assert(got.size > 3, "expected corpus points in the skyline too")
  }

  test("skyline3d is exact for negative coordinates: cells normalize " +
      "to the min cell, so negative-cell candidates meet their dominators") {
    import spark.implicits._
    // the r11 ADVICE case: before cell normalization a candidate in a
    // negative __ci cell was never joined against its dominators (the
    // covering-cell explode ran sequence(0, qci)), so dominated points
    // SURVIVED — a shifted corpus straddling zero exercises exactly that
    val pts = events.select(col("event_id").cast("long").as("id"),
        (col("value") - lit(5e8)).as("x"), // ~half the corpus negative
        ((col("user_id") % 223) - 111L).cast("long").as("y"),
        (col("event_id") % 97).cast("long").as("z"))
      .limit(4000)
    val got = ScaleOps.skyline3d(pts, "id", wx = 1e7, wy = 10.0)
      .select("id").collect().map(_.getLong(0)).toSet
    val naive = pts.alias("b").join(pts.alias("a"),
        col("a.x") >= col("b.x") && col("a.y") >= col("b.y") &&
          col("a.z") >= col("b.z") &&
          (col("a.x") > col("b.x") || col("a.y") > col("b.y") ||
            col("a.z") > col("b.z")),
        "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == naive,
      s"negative-coordinate skyline diverges: extra=${got -- naive} " +
        s"missing=${naive -- got}")
  }

  test("sample sketch is a pure function of the row set: shard-built " +
      "union equals the one-pass sketch, exactly") {
    val ev = events
    val whole = SampleQuantile
      .sketchOf(ev, "event_type", "event_id", "value", 64)
    // union algebra: bottom-k(bottom-k(A) ∪ bottom-k(B)) = bottom-k(A ∪ B)
    val w = Window.partitionBy("event_type").orderBy(col("hv"), col("v"))
    val merged = SampleQuantile
      .sketchOf(ev.filter(col("event_id") % 2 === 0),
        "event_type", "event_id", "value", 64)
      .unionByName(SampleQuantile.sketchOf(
        ev.filter(col("event_id") % 2 =!= 0),
        "event_type", "event_id", "value", 64))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 64)
      .drop("rn")
    def rows(df: DataFrame): Set[(String, Long, Double)] = df
      .select("event_type", "hv", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(rows(merged) == rows(whole))
    assert(rows(whole).nonEmpty)
  }

  test("sample-quantile artifact: append-then-serve equals " +
      "rebuild-on-everything; replayed append folds away; a group " +
      "smaller than k is sampled exhaustively (exact quantiles)") {
    val ev = events
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sq_test_").toString
    SampleQuantile.build(ev.filter(col("event_id") % 2 === 0), dir,
      "event_type", "event_id", "value", k = 64)
    SampleQuantile.append(ev.filter(col("event_id") % 2 =!= 0), dir,
      "event_type", "event_id", "value")
    // replay the same delta: serve-side (hv, v) dedup must absorb it
    SampleQuantile.append(ev.filter(col("event_id") % 2 =!= 0), dir,
      "event_type", "event_id", "value")
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val served = SampleQuantile
      .quantilesServed(spark, dir, "event_type", qs)
      .orderBy("event_type").collect().toSeq
    val rebuilt = SampleQuantile.quantiles(
        SampleQuantile.sketchOf(ev, "event_type", "event_id", "value", 64),
        "event_type", qs)
      .orderBy("event_type").collect().toSeq
    assert(served == rebuilt)
    // compact: serve results unchanged, candidate rows collapse to <= k/group
    SampleQuantile.compact(spark, dir, "event_type")
    val afterCompact = SampleQuantile
      .quantilesServed(spark, dir, "event_type", qs)
      .orderBy("event_type").collect().toSeq
    assert(afterCompact == served)
    // exhaustive regime: k larger than any group => p50 is the exact
    // discrete median
    val big = SampleQuantile.quantiles(
      SampleQuantile.sketchOf(ev, "event_type", "event_id", "value",
        1000000), "event_type", Seq("p50" -> 0.5))
    val exact = ev.filter(col("value").isNotNull)
      .withColumn("vr", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy("event_type")))
      .filter(col("vr") === ceil(lit(0.5) * col("n")).cast("long"))
      .select(col("event_type"), col("value").as("p50_exact"))
    val joined = big.join(exact, "event_type")
      .filter(col("p50") =!= col("p50_exact")).count()
    assert(joined == 0L)
  }

  test("epochUpsample: floor copies for everyone, the fractional copy " +
      "for exactly the bucketed subset, downsampling when e < 1, and " +
      "distinct copy indices per doc") {
    import graft.ops.Sampling
    val docs = queries.T.documents(spark, sf)
    // e = 2.5: every doc twice, bucket<50 docs three times
    val up = Sampling.epochUpsample(docs, lit(2.5))
    val perDoc = up.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("copy")).as("nc"))
    assert(perDoc.filter(col("n") =!= col("nc")).count() == 0,
      "copy indices must be distinct per doc")
    val counts = perDoc.select("n").collect().map(_.getLong(0))
    assert(counts.forall(n => n == 2L || n == 3L))
    val nDocs = docs.count().toDouble
    val frac3 = counts.count(_ == 3L) / nDocs
    assert(math.abs(frac3 - 0.5) < 0.15,
      s"fractional-copy rate should be ~0.5, got $frac3")
    // e = 0.5 degenerates to a plain fractional keep
    val down = Sampling.epochUpsample(docs, lit(0.5))
    assert(down.groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0)
    val keep = down.count() / nDocs
    assert(math.abs(keep - 0.5) < 0.15, s"keep rate ~0.5, got $keep")
    // determinism: same inputs, same emitted multiset
    val again = Sampling.epochUpsample(docs, lit(2.5))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(again.join(perDoc, Seq("doc_id"))
      .filter(again("n") =!= perDoc("n")).count() == 0)
  }

  test("serve-side replay dedup keeps distinct rows that collide on the " +
      "32-bit hv with an equal value — only true replays fold away") {
    import spark.implicits._
    // find two DISTINCT ids whose md5 8-hex prefixes (the hv) collide —
    // deterministic search, birthday-bound guarantees a hit well under 1M
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(id: Long): Long = {
      val d = md.digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val seen = scala.collection.mutable.HashMap.empty[Long, Long]
    var id = 0L
    var pair: Option[(Long, Long)] = None
    while (pair.isEmpty && id < 1000000L) {
      val h = hv(id)
      seen.get(h) match {
        case Some(prev) => pair = Some((prev, id))
        case None => seen.update(h, id)
      }
      id += 1L
    }
    val (a, b) = pair.getOrElse(fail("no 32-bit md5-prefix collision under 1M ids"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sq_collide_").toString
    // same group, same value, colliding hv, different ids: a rebuild keeps
    // BOTH rows, so append-then-serve must too
    SampleQuantile.build(Seq(("g", a, 1.0)).toDF("g", "id", "value"),
      dir, "g", "id", "value", k = 64)
    SampleQuantile.append(Seq(("g", b, 1.0)).toDF("g", "id", "value"),
      dir, "g", "id", "value")
    assert(SampleQuantile.serveSketch(spark, dir, "g").count() == 2L,
      "a distinct colliding row was folded away as if it were a replay")
    // while a TRUE replay of the same row still folds to one
    SampleQuantile.append(Seq(("g", b, 1.0)).toDF("g", "id", "value"),
      dir, "g", "id", "value")
    assert(SampleQuantile.serveSketch(spark, dir, "g").count() == 2L,
      "a replayed append must be absorbed by the serve-side dedup")
  }

  test("sample-quantile serve reads only the artifact, never the corpus") {
    val ev = events
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sq_plan_").toString
    SampleQuantile.build(ev, dir, "event_type", "event_id", "value", k = 64)
    val plan = SampleQuantile
      .quantilesServed(spark, dir, "event_type", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains(dir))
    assert(!plan.contains("events.parquet"),
      "serving must not re-scan the corpus")
  }
}
