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

  val defs: Seq[QueryDef] = Seq(hllCardinality, gkQuantile, hllMerge,
    kmvDistinct)
}
