package graft.queries

import org.apache.spark.sql.functions._

/** Approximate sketch aggregates — the 100 TB cardinality/quantile path.
  *
  * Exact COUNT(DISTINCT) shuffles every distinct key twice (expand +
  * final); HyperLogLog++ partials are fixed-size (~1.5 KB at 5% rsd) and
  * merge associatively, so the shuffle is O(groups), not O(distinct keys).
  * Same shape for quantiles: the Greenwald-Khanna sketch behind
  * `percentile_approx` keeps O((1/eps) log(eps n)) tuples per partial
  * versus a full sort for exact percentiles. Both are Spark built-ins with
  * codegen'd partial aggregation — nothing custom needed.
  *
  * Gate design: a sketch's value is engine-specific, so the driver queries
  * emit the EXACT answer (oracle-comparable) plus a boolean asserting the
  * sketch landed within its guaranteed tolerance; the oracle pins the
  * boolean to true. Spark's sketches are deterministic for a fixed input,
  * so the boolean is stable, and a regression that degrades sketch accuracy
  * beyond spec flips the gate red.
  */
object Sketches {

  /** HLL distinct orders per status vs exact. rsd = 5%; the gate allows
    * 3 standard errors (15%) — a miss means the sketch is broken, not
    * unlucky. */
  val hllCardinality = QueryDef(
    "q_sk_hll_distinct",
    """SELECT o_orderstatus,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cnt,
      |       true AS within_tol
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("exact_cnt"),
        approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx_cnt"))
      .select(col("o_orderstatus"), col("exact_cnt"),
        (abs(col("approx_cnt") - col("exact_cnt"))
          <= col("exact_cnt") * lit(0.15)).as("within_tol"))
      .orderBy("o_orderstatus")
  }

  /** GK-sketch median of o_totalprice per status vs exact. accuracy = 100
    * bounds rank error at 1%; the gate checks the sketch value lies between
    * the exact 0.48 and 0.52 quantiles (1% rank error + interpolation
    * slack). Exact percentiles use the same continuous interpolation in
    * both engines (precedent: q_a13_percentiles). */
  val gkQuantile = QueryDef(
    "q_sk_quantile_median",
    """SELECT o_orderstatus,
      |       quantile_cont(o_totalprice, 0.5) AS exact_p50,
      |       true AS within_tol
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("percentile_approx(o_totalprice, 0.5, 100)").as("approx_p50"),
        expr("percentile(o_totalprice, 0.48)").as("lo"),
        expr("percentile(o_totalprice, 0.52)").as("hi"))
      .select(col("o_orderstatus"), col("exact_p50"),
        (col("approx_p50") >= col("lo") && col("approx_p50") <= col("hi"))
          .as("within_tol"))
      .orderBy("o_orderstatus")
  }

  /** Sketch MERGEABILITY — the property that makes sketches the 100 TB
    * path: per-shard DataSketches HLL sketches (here: orders split by
    * orderkey parity, standing in for 1000 executor partials) union-merge
    * into the same estimate a single pass would give. Estimate gated
    * within 5% of exact (lgConfigK=12 → rsd ≈ 1.6%, gate at ~3σ). */
  val hllMerge = QueryDef(
    "q_sk_hll_merge",
    """SELECT o_orderstatus,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cnt,
      |       true AS within_tol
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val orders = T.orders(s, d)
    val shardSketches = orders
      .withColumn("shard", col("o_orderkey") % 2)
      .groupBy("o_orderstatus", "shard")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = shardSketches
      .groupBy("o_orderstatus")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_cnt"))
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("exact_cnt"))
    exact.join(merged, "o_orderstatus")
      .select(col("o_orderstatus"), col("exact_cnt"),
        (abs(col("approx_cnt") - col("exact_cnt"))
          <= col("exact_cnt") * lit(0.05)).as("within_tol"))
      .orderBy("o_orderstatus")
  }

  /** KMV distinct users per event type: k smallest md5-prefix hashes →
    * (k−1)·2³²/kth-min. The md5 hash makes the sketch deterministic and
    * engine-neutral, so — unlike HLL — the ESTIMATE ITSELF is
    * hash-compared against the DuckDB twin, and the within_tol gate
    * (3σ at CV ≈ 1/√(k−2)) is additionally pinned true in the oracle:
    * an accuracy regression flips the row red. */
  val kmvDistinct = QueryDef(
    "q_sk_kmv_distinct",
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
      |              AS BIGINT) AS hv
      |  FROM events WHERE user_id IS NOT NULL
      |), r AS (
      |  SELECT event_type, hv,
      |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      |  FROM h
      |), tops AS (
      |  SELECT event_type, max(hv) AS hk, CAST(count(*) AS BIGINT) AS nh
      |  FROM r WHERE rn <= 256 GROUP BY event_type
      |), ex AS (
      |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_cnt
      |  FROM events GROUP BY event_type
      |)
      |SELECT t.event_type, ex.exact_cnt,
      |       CASE WHEN nh >= 256 THEN 255 * 4294967296.0 / hk
      |            ELSE CAST(nh AS DOUBLE) END AS kmv_est,
      |       true AS within_tol
      |FROM tops t JOIN ex ON t.event_type = ex.event_type
      |ORDER BY t.event_type""".stripMargin) { (s, d) =>
    val est = graft.ops.ScaleOps.kmvDistinct(T.events(s, d),
      "event_type", "user_id", k = 256)
    val exact = T.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_cnt"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("exact_cnt"), col("kmv_est"),
        (abs(col("kmv_est") - col("exact_cnt"))
          <= col("exact_cnt") * lit(3.0 / math.sqrt(254.0))).as("within_tol"))
      .orderBy("event_type")
  }

  /** The events feed with PLANTED heavy hitters (every user_id ≡ 3 mod
    * 50 delivered 8×, the q_stream_dedup planting idiom) — the synthetic
    * stream's per-user counts are near-uniform (~50–90), and a frequency
    * sketch only has a story to tell when some keys actually dominate. */
  private def skewedEvents(s: org.apache.spark.sql.SparkSession,
      d: String) = {
    val ev = T.events(s, d).filter(col("user_id").isNotNull)
    ev.unionByName(ev.filter(col("user_id") % 50 === 3)
      .withColumn("__r", explode(expr("sequence(1, 7)"))).drop("__r"))
  }

  /** The planted feed's CTE twin (all columns reduced to what the CMS
    * queries read). */
  private val skewedEventsCte =
    """ev AS (
      |  SELECT event_id, user_id FROM events WHERE user_id IS NOT NULL
      |  UNION ALL
      |  SELECT event_id, user_id FROM events, generate_series(1, 7) g(i)
      |  WHERE user_id IS NOT NULL AND user_id % 50 = 3
      |)""".stripMargin

  /** Count-min sketch point estimates: top-20 users by estimated event
    * count from a 4×64-cell sketch (~2 KB) instead of a per-user count
    * table, over the planted-skew feed. Deliberately UNDERSIZED width
    * (64 buckets for ~150 users) so collisions are real and the
    * depth-min is doing visible work — and the planted heavy users
    * (exact ≈ 8× the uniform mass) still rank above the collision noise,
    * which is the sketch's job. Like KMV, the md5 hashing makes the
    * ESTIMATE itself engine-neutral, so the DuckDB twin hash-compares
    * cms_est (not just a tolerance bit). The gate pins the CMS
    * guarantee: never an undercount, and over by at most e·N/width (the
    * ε·N Markov bound at depth-row confidence — a real ceiling roughly
    * at the planted keys' own counts, not a tautology). */
  val cmsTopk = QueryDef(
    "q_sk_cms_topk",
    s"""WITH $skewedEventsCte, k AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      |  FROM ev GROUP BY user_id
      |), h AS (
      |  SELECT k.user_id, k.exact_cnt, r.i,
      |         CAST('0x' || substring(md5('cms:' || CAST(r.i AS VARCHAR)
      |           || ':' || CAST(k.user_id AS VARCHAR)), 1, 8) AS BIGINT)
      |           % 64 AS bucket
      |  FROM k CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) r
      |), cells AS (
      |  SELECT i, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cnt
      |  FROM h GROUP BY i, bucket
      |), est AS (
      |  SELECT h.user_id, CAST(min(c.cnt) AS BIGINT) AS cms_est
      |  FROM h JOIN cells c ON c.i = h.i AND c.bucket = h.bucket
      |  GROUP BY h.user_id
      |)
      |SELECT k.user_id, k.exact_cnt, est.cms_est, true AS within_tol
      |FROM k JOIN est USING (user_id)
      |ORDER BY cms_est DESC, user_id
      |LIMIT 20""".stripMargin) { (s, d) =>
    import graft.ops.CountMin
    val ev = skewedEvents(s, d)
    val cells = CountMin.cmsCells(ev, "user_id", depth = 4, width = 64)
    val keys = ev.select("user_id").distinct()
    cmsReport(ev, CountMin.cmsEstimate(cells, keys, "user_id",
      depth = 4, width = 64))
  }

  /** Shared gate/report tail of the CMS queries: exact counts joined to
    * the estimates, the one-sided ε·N guarantee as within_tol, top-20 by
    * estimate (ties broken by user_id — total order for the hash
    * compare). */
  private def cmsReport(ev: org.apache.spark.sql.DataFrame,
      est: org.apache.spark.sql.DataFrame) = {
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
    val total = ev.agg(count(lit(1)).as("__n"))
    exact.join(est, "user_id").crossJoin(broadcast(total))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt") &&
          col("cms_est") <= col("exact_cnt")
            + lit(math.E) * col("__n") / lit(64.0)).as("within_tol"))
      .orderBy(col("cms_est").desc, col("user_id"))
      .limit(20)
  }

  /** The CMS through its persisted-artifact lifecycle: build from the
    * even-event half, APPEND the odd half (geometry read from the
    * artifact's own meta — never re-supplied), serve from the folded
    * cells. Cells are additive counters, so build+append+fold is
    * BIT-IDENTICAL to the one-pass sketch — the query shares
    * [[cmsTopk]]'s oracle, and a fold bug (double-count, lost batch,
    * geometry drift) breaks the hash match. */
  val cmsServedIncremental = QueryDef(
    "q_sk_cms_served_incremental",
    cmsTopk.oracle.get) { (s, d) =>
    import graft.ops.{CountMin, Models}
    val ev = skewedEvents(s, d)
    val dir = Models.ensureBuilt(s"cms_user|$d") { tmp =>
      CountMin.cmsBuild(ev.filter(col("event_id") % 2 === 0), tmp,
        "user_id", depth = 4, width = 64)
      CountMin.cmsAppend(ev.filter(col("event_id") % 2 =!= 0), tmp,
        "user_id")
    }
    val keys = ev.select("user_id").distinct()
    cmsReport(ev, CountMin.cmsServe(s, dir, keys, "user_id"))
  }

  /** KMV set operations: pairwise cross-source Jaccard / union /
    * intersection cardinality ESTIMATES from 128-minimum signatures over
    * shingle hashes, against the exact distinct-shingle overlap — the
    * sketched form of the curation question q_ns_source_overlap answers
    * with verified near-dup pairs. At 100 TB only the O(sources·k)
    * signatures move; the exact side exists for this gate. Estimates are
    * md5-deterministic and hash-compared; the tolerance gate (pinned true)
    * allows 3σ of the Jaccard estimator (σ = √(J(1−J)/k), bounded by its
    * J=0.5 maximum ≈ 0.044 → 0.14) and 3σ of the union estimator
    * (CV 1/√(k−2) → 27%), intersection combining both. */
  val kmvOverlap = QueryDef(
    "q_sk_kmv_overlap",
    graft.ops.ScaleOps.kmvSourceOverlapOracleSql(k = 128, shingleN = 3)) {
    (s, d) =>
    val k = 128
    graft.ops.ScaleOps.kmvSourceOverlap(T.documents(s, d), k = k,
        shingleN = 3)
      .withColumn("within_tol",
        abs(col("jaccard_kmv") - col("jaccard_exact"))
          <= lit(3.0 * 0.5 / math.sqrt(k.toDouble)) &&
        abs(col("union_kmv") - col("n_union"))
          <= col("n_union") * lit(3.0 / math.sqrt((k - 2).toDouble)) &&
        abs(col("inter_kmv") - col("n_inter"))
          <= col("n_union") * lit(3.0 * 0.5 / math.sqrt(k.toDouble))
            + col("n_inter") * lit(3.0 / math.sqrt((k - 2).toDouble)))
      .orderBy("source_a", "source_b")
  }

  /** HLL sketch-cube rollup: distinct users per event type over an
    * arbitrary DATE RANGE answered from a persisted days×types table of
    * fixed-size sketches — built in one batch, APPENDED with a second
    * (the additive-rollup lifecycle), range-served by sketch union.
    * Distinct counts don't add, so no plain rollup can answer range
    * queries; sketch union is the algebra that makes the rollup
    * composable, and the serve path reads days×types ~1.5 KB rows, never
    * the event log. Gate form follows q_sk_hll_distinct: the estimate is
    * engine-specific (DataSketches), so the query emits the EXACT answer
    * plus a within-5% boolean (lgConfigK=12 → rsd ≈ 1.6%, ~3σ), pinned
    * true in the oracle. */
  val hllCube = QueryDef(
    "q_sk_hll_cube",
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_cnt,
      |       true AS within_tol
      |FROM events
      |WHERE user_id IS NOT NULL
      |  AND CAST(CAST(ts AS TIMESTAMP) AS DATE)
      |        BETWEEN DATE '2024-01-08' AND DATE '2024-01-22'
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    import graft.ops.{Models, ScaleOps}
    val ev = T.events(s, d).filter(col("user_id").isNotNull)
    val dir = Models.ensureBuilt(s"hllcube|$d") { tmp =>
      ScaleOps.hllCubeBuild(
        ev.filter(to_date(col("ts")) <= lit("2024-01-15")), tmp)
      ScaleOps.hllCubeAppend(
        ev.filter(to_date(col("ts")) > lit("2024-01-15")), tmp)
    }
    val est = ScaleOps.hllCubeRangeDistinct(s, dir,
      "2024-01-08", "2024-01-22")
    val exact = ev
      .filter(to_date(col("ts")).between("2024-01-08", "2024-01-22"))
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_cnt"))
    exact.join(est, "event_type")
      .select(col("event_type"), col("exact_cnt"),
        (abs(col("approx_cnt") - col("exact_cnt"))
          <= col("exact_cnt") * lit(0.05)).as("within_tol"))
      .orderBy("event_type")
  }

  /** Shared DuckDB twin for the bottom-k-sample quantile sketch: the
    * sample (k smallest md5-prefix hashes of event_id per type, ties on
    * (hv, v)) and the discrete quantile selections are engine-neutral,
    * so the ESTIMATES hash-compare exactly; the within_tol gate checks
    * the exact CDF at the p50/p90 estimates against the DKW envelope
    * (√(ln(2/δ)/2k) ≈ 0.072 at k = 512, δ = 1%; gate at 0.10 + 1/n).
    * All quantile fractions are written `0.25e0`-style so DuckDB does
    * the same IEEE double multiply as Spark, never exact-decimal math —
    * ceil(0.9·n) differs between the two at some n otherwise. */
  private val sampleQuantileOracle =
    """WITH h AS (
      |  SELECT event_type, value AS v,
      |         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
      |              AS BIGINT) AS hv
      |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
      |), s AS (
      |  SELECT event_type, hv, v FROM (
      |    SELECT event_type, hv, v,
      |           row_number() OVER (PARTITION BY event_type
      |                              ORDER BY hv, v) AS rn
      |    FROM h) WHERE rn <= 512
      |), o AS (
      |  SELECT event_type, v, hv,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY v, hv) AS vr,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM s
      |), est AS (
      |  SELECT event_type, CAST(max(n) AS BIGINT) AS n_sample,
      |    max(CASE WHEN vr = CAST(ceil(0.25e0 * n) AS BIGINT) THEN v END) AS p25_est,
      |    max(CASE WHEN vr = CAST(ceil(0.5e0 * n) AS BIGINT) THEN v END) AS p50_est,
      |    max(CASE WHEN vr = CAST(ceil(0.75e0 * n) AS BIGINT) THEN v END) AS p75_est,
      |    max(CASE WHEN vr = CAST(ceil(0.9e0 * n) AS BIGINT) THEN v END) AS p90_est
      |  FROM o GROUP BY event_type
      |), g AS (
      |  SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_total,
      |    CAST(sum(CASE WHEN ev.value <= e.p50_est THEN 1 ELSE 0 END)
      |         AS DOUBLE) / count(*) AS f50,
      |    CAST(sum(CASE WHEN ev.value <= e.p90_est THEN 1 ELSE 0 END)
      |         AS DOUBLE) / count(*) AS f90
      |  FROM est e JOIN events ev ON ev.event_type = e.event_type
      |  WHERE ev.value IS NOT NULL AND ev.event_id IS NOT NULL
      |  GROUP BY e.event_type
      |)
      |SELECT e.event_type, e.n_sample, e.p25_est, e.p50_est, e.p75_est,
      |       e.p90_est, g.n_total,
      |       (abs(f50 - 0.5e0) <= 0.1e0 + 1.0e0 / n_total AND
      |        abs(f90 - 0.9e0) <= 0.1e0 + 1.0e0 / n_total) AS within_tol
      |FROM est e JOIN g ON e.event_type = g.event_type
      |ORDER BY e.event_type""".stripMargin

  private val sampleQs = Seq("p25_est" -> 0.25, "p50_est" -> 0.5,
    "p75_est" -> 0.75, "p90_est" -> 0.9)

  /** Estimates + exact-CDF gate over the full feed, mirroring the twin. */
  private def sampleQuantileReport(s: org.apache.spark.sql.SparkSession,
      d: String, est: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val evf = T.events(s, d)
      .filter(col("value").isNotNull && col("event_id").isNotNull)
    val gate = evf
      .join(est.select("event_type", "p50_est", "p90_est"), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        (sum(when(col("value") <= col("p50_est"), 1).otherwise(0))
          .cast("double") / count(lit(1))).as("__f50"),
        (sum(when(col("value") <= col("p90_est"), 1).otherwise(0))
          .cast("double") / count(lit(1))).as("__f90"))
    est.join(gate, "event_type")
      .withColumn("within_tol",
        abs(col("__f50") - lit(0.5)) <= lit(0.1) + lit(1.0) / col("n_total")
          && abs(col("__f90") - lit(0.9)) <= lit(0.1) + lit(1.0) / col("n_total"))
      .drop("__f50", "__f90")
      .orderBy("event_type")
  }

  /** Bottom-k-sample quantile sketch (ops/SampleQuantile): per-type
    * p25/p50/p75/p90 from a 512-row uniform sample instead of a full
    * sort — the estimates themselves hash-compare against the DuckDB
    * twin (md5-deterministic sample, interpolation-free selection), and
    * the DKW gate pins the accuracy contract. */
  val sampleQuantiles = QueryDef(
    "q_sk_sample_quantiles", sampleQuantileOracle) { (s, d) =>
    import graft.ops.SampleQuantile
    val ev = T.events(s, d)
    val est = SampleQuantile.quantiles(
      SampleQuantile.sketchOf(ev, "event_type", "event_id", "value", 512),
      "event_type", sampleQs)
    sampleQuantileReport(s, d, est)
  }

  /** The sketch's append lifecycle: build on half the feed, fold the
    * other half in as a delta (batch-only scan), serve from the
    * persisted artifact — bottom-k's union algebra makes
    * append-then-serve ≡ rebuild-on-everything, so the oracle is the
    * same full-feed twin. */
  val sampleQuantilesServed = QueryDef(
    "q_sk_sample_quantiles_served_incremental", sampleQuantileOracle) {
    (s, d) =>
    import graft.ops.{Models, SampleQuantile}
    val ev = T.events(s, d)
    val dir = Models.ensureBuilt(s"samplequant|$d") { tmp =>
      SampleQuantile.build(ev.filter(col("event_id") % 2 === 0), tmp,
        "event_type", "event_id", "value", k = 512)
      SampleQuantile.append(ev.filter(col("event_id") % 2 =!= 0), tmp,
        "event_type", "event_id", "value")
    }
    sampleQuantileReport(s, d,
      SampleQuantile.quantilesServed(s, dir, "event_type", sampleQs))
  }

  /** CMS after append→COMPACT (r11): the appended cell partials fold to
    * ≤ depth×width rows (the exact integer sum serve performs at load,
    * run as maintenance), then serve — identical estimates, same oracle. */
  val cmsServedCompacted = QueryDef(
    "q_sk_cms_served_compacted",
    cmsTopk.oracle.get) { (s, d) =>
    import graft.ops.{CountMin, Models}
    val ev = skewedEvents(s, d)
    val dir = Models.ensureBuilt(s"cms_user_cmp|$d") { tmp =>
      CountMin.cmsBuild(ev.filter(col("event_id") % 2 === 0), tmp,
        "user_id", depth = 4, width = 64)
      CountMin.cmsAppend(ev.filter(col("event_id") % 2 =!= 0), tmp,
        "user_id")
      CountMin.cmsCompact(s, tmp)
    }
    val keys = ev.select("user_id").distinct()
    cmsReport(ev, CountMin.cmsServe(s, dir, keys, "user_id"))
  }

  /** Sample-quantile sketch after append→COMPACT (r11): the candidate
    * rows fold to the served bottom-k (the fold IS the serve's first
    * step, run as maintenance), then serve — identical estimates, same
    * full-feed oracle. */
  val sampleQuantilesCompacted = QueryDef(
    "q_sk_sample_quantiles_served_compacted", sampleQuantileOracle) {
    (s, d) =>
    import graft.ops.{Models, SampleQuantile}
    val ev = T.events(s, d)
    val dir = Models.ensureBuilt(s"samplequant_cmp|$d") { tmp =>
      SampleQuantile.build(ev.filter(col("event_id") % 2 === 0), tmp,
        "event_type", "event_id", "value", k = 512)
      SampleQuantile.append(ev.filter(col("event_id") % 2 =!= 0), tmp,
        "event_type", "event_id", "value")
      SampleQuantile.compact(s, tmp, "event_type")
    }
    sampleQuantileReport(s, d,
      SampleQuantile.quantilesServed(s, dir, "event_type", sampleQs))
  }

  val defs: Seq[QueryDef] = Seq(hllCardinality, gkQuantile, hllMerge,
    kmvDistinct, cmsTopk, cmsServedIncremental, cmsServedCompacted,
    kmvOverlap, hllCube,
    sampleQuantiles, sampleQuantilesServed, sampleQuantilesCompacted)
}
