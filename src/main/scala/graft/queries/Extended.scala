package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Operators beyond the reference's surface that any warehouse user of this
  * engine expects (the reference simply never needed them — SURVEY notes
  * "no semi/anti joins, no grouping sets" as observations, not constraints):
  * semi/anti joins, ROLLUP, PIVOT, scalar subqueries, sliding windows.
  * All oracle-checked.
  */
object Extended {

  /** LEFT SEMI join (EXISTS). */
  val semiJoin = QueryDef(
    "q_j9_semi_join",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT'
      |                AND o.o_totalprice >= 150000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val urgent = T.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= 150000)
    T.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI join (NOT EXISTS). */
  val antiJoin = QueryDef(
    "q_j10_anti_join",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val recent = T.orders(s, d)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    T.customer(s, d)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** GROUP BY ROLLUP — subtotal + grand-total rows. */
  val rollup = QueryDef(
    "q_a11_rollup",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), Fns.dsum(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  /** PIVOT order counts per status into columns. */
  val pivot = QueryDef(
    "q_a12_pivot",
    """SELECT o_custkey,
      |       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders
      |WHERE o_custkey < 300
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .filter(col("o_custkey") < 300)
      .groupBy("o_custkey")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_custkey")
  }

  /** Scalar subquery: rows above the (decimal-exact) global average. */
  val scalarSubquery = QueryDef(
    "q_p8_scalar_subquery",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |                             / count(*) * 1.8
      |                      FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = T.orders(s, d)
    val thr = orders.agg((Fns.davg(col("o_totalprice")) * 1.8).as("thr"))
    orders
      .join(broadcast(thr))
      .filter(col("o_totalprice") > col("thr"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Sliding window (1h width, 30m slide) — each event lands in two
    * windows; Spark's epoch-aligned window() vs an explicit window-series
    * join in the oracle. */
  val slidingWindow = QueryDef(
    "q_stream_sliding_window",
    """WITH bounds AS (
      |  SELECT date_trunc('hour', min(ts)) AS a, max(ts) AS b FROM events
      |),
      |wins AS (
      |  SELECT unnest(generate_series(a - INTERVAL 30 MINUTE, b, INTERVAL 30 MINUTE)) AS ws
      |  FROM bounds
      |)
      |SELECT ws AS window_start, event_type, count(*) AS n_events
      |FROM wins JOIN events ON ts >= ws AND ts < ws + INTERVAL 1 HOUR
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    graft.streaming.StreamOps.slidingCounts(T.events(s, d))
      .orderBy("window_start", "event_type")
  }

  /** INTERSECT / EXCEPT (distinct set semantics both engines). */
  val setOps = QueryDef(
    "q_u4_intersect_except",
    """WITH f_parts AS (SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |                 WHERE o_orderstatus = 'F'),
      |     o_parts AS (SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |                 WHERE o_orderstatus = 'O')
      |SELECT 'both' AS grp, count(*) AS n
      |FROM (SELECT l_partkey FROM f_parts INTERSECT SELECT l_partkey FROM o_parts) x
      |UNION ALL
      |SELECT 'only_f' AS grp, count(*) AS n
      |FROM (SELECT l_partkey FROM f_parts EXCEPT SELECT l_partkey FROM o_parts) y
      |ORDER BY grp""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d)
    val orders = T.orders(s, d)
    def parts(status: String) = li
      .join(orders.filter(col("o_orderstatus") === status),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_partkey")
    val f = parts("F")
    val o = parts("O")
    f.intersect(o).agg(count(lit(1)).as("n")).select(lit("both").as("grp"), col("n"))
      .unionByName(
        f.except(o).agg(count(lit(1)).as("n")).select(lit("only_f").as("grp"), col("n")))
      .orderBy("grp")
  }

  /** Exact percentiles. l_quantity is integer-valued, so quantile
    * interpolation at .25/.5/.75 is exact in both engines (fractions are
    * powers of two — no fp divergence between the a+(b-a)f and weighted
    * forms). */
  val percentiles = QueryDef(
    "q_a13_percentiles",
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.25) AS p25,
      |       quantile_cont(l_quantity, 0.5) AS median,
      |       quantile_cont(l_quantity, 0.75) AS p75
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .orderBy("l_returnflag")
  }

  /** Population stddev via decimal-exact sum and sum-of-squares, so the
    * only double math is the identical final expression on both sides. */
  val stddevExact = QueryDef(
    "q_a14_stddev_exact",
    """SELECT l_returnflag,
      |       sqrt((CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |             - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |               * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |            / count(*)) AS stddev_pop_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val s2 = sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(18, 4)))
      .cast("double")
    val s1 = sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
    val n = count(lit(1))
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(sqrt((s2 - s1 * s1 / n) / n).as("stddev_pop_qty"))
      .orderBy("l_returnflag")
  }

  /** GROUP BY CUBE with GROUPING() markers — the full grouping-sets
    * surface (ROLLUP above is the linear slice). */
  val cube = QueryDef(
    "q_a15_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
      |       count(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  /** RANGE window frame over a value axis (30-day trailing order count per
    * customer) — the frame variant the ROWS-frame queries don't cover.
    * Order key is an integer day offset so the frame bound semantics are
    * identical across engines. */
  val rangeFrame = QueryDef(
    "q_w9_range_frame",
    """SELECT o_orderkey, o_custkey,
      |       CAST(count(*) OVER (
      |         PARTITION BY o_custkey
      |         ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
      |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val day = datediff(col("o_orderdate").cast("date"), lit("1990-01-01").cast("date"))
    val w = Window.partitionBy("o_custkey").orderBy(day.cast("long"))
      .rangeBetween(-30, Window.currentRow)
    T.orders(s, d)
      .withColumn("n_30d", count(lit(1)).over(w))
      .select("o_orderkey", "o_custkey", "n_30d")
      .orderBy("o_orderkey")
  }

  /** The `spark.sql` TEXT entry point (SURVEY §3.2's dashboard hot path is
    * SQL text over views): registers temp views and runs pure ANSI SQL
    * through Catalyst's SQL parser — same plan as the DataFrame twin, and
    * the oracle is literally the same statement. */
  val sqlTextApi = QueryDef(
    "q_sql_text_api",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |FROM lineitem
      |WHERE l_shipdate <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    T.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n_lines,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Calendar-spine gap-fill + forward-fill: per-user daily stats with
    * missing days materialized (count 0) and the last observed daily value
    * carried forward — the time-series densification every reporting
    * layer needs. Spine = per-user date sequence explode (parallel across
    * users); fill = one left join + one carry-forward window, both keyed
    * on user_id. */
  val gapFill = QueryDef(
    "q_ts_gapfill",
    """WITH e AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
      |  FROM events WHERE user_id < 20
      |), daily AS (
      |  SELECT user_id, day, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      |  FROM e GROUP BY user_id, day
      |), spine AS (
      |  SELECT user_id,
      |         CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
      |                                     CAST(max(day) AS TIMESTAMP),
      |                                     INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id
      |), j AS (
      |  SELECT s.user_id, s.day,
      |         COALESCE(n, CAST(0 AS BIGINT)) AS n_events, day_value
      |  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
      |)
      |SELECT user_id, day, n_events,
      |       last_value(day_value IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
      |FROM j ORDER BY user_id, day""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = T.events(s, d).filter(col("user_id") < 20)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
    val daily = ev.groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"), graft.queries.Fns.dsum(col("value")).as("day_value"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("day_value"), ignoreNulls = true).over(
          Window.partitionBy("user_id").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("carried_value"))
      .orderBy("user_id", "day")
  }

  /** Pearson correlation from decimal-exact moments: l_quantity (int, ≤50)
    * × l_discount (2dp, ≤0.1) keep every power/cross term at ≤ 4dp AND
    * every moment sum's scaled integer far below 2^53 through sf0.1 — the
    * bound that matters, because DuckDB's DECIMAL→DOUBLE cast double-
    * rounds (int128→double, then scale divide) while Spark single-rounds,
    * so a sum needing > 53 bits can differ by 1 ulp (bitten by
    * l_extendedprice² at sf0.001). Under the bound every component cast is
    * exact, the closed-form double math is bit-identical (sqrt is
    * correctly rounded, unlike ln), and the built-in streaming corr is
    * pinned within 1e-9. */
  val corrMoments = QueryDef(
    "q_a16_corr_decimal",
    """WITH m AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
      |         CAST(sum(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |         CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS syy,
      |         CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag,
      |       (n * sxy - sx * sy)
      |         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_disc,
      |       true AS builtin_agrees
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val dec = DecimalType(28, 4)
    val m = T.lineitem(s, d).groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("l_quantity").cast(dec)).cast("double").as("sx"),
      sum(col("l_discount").cast(dec)).cast("double").as("sy"),
      sum((col("l_quantity") * col("l_quantity")).cast(dec)).cast("double").as("sxx"),
      sum((col("l_discount") * col("l_discount")).cast(dec)).cast("double").as("syy"),
      sum((col("l_quantity") * col("l_discount")).cast(dec)).cast("double").as("sxy"),
      corr(col("l_quantity"), col("l_discount")).as("builtin"))
    val corrExact = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
        * sqrt(col("n") * col("syy") - col("sy") * col("sy")))
    m.select(
        col("l_returnflag"),
        corrExact.as("corr_qty_disc"),
        (abs(corrExact - col("builtin")) < lit(1e-9)).as("builtin_agrees"))
      .orderBy("l_returnflag")
  }

  /** Explicit GROUPING SETS (finer than rollup/cube) with grouping()
    * markers, through the SQL text path on both engines. */
  val groupingSets = QueryDef(
    "q_a19_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
      |       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
      |         o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    T.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        |         o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** Ordered conversion funnel: users who viewed, then clicked AFTER their
    * first view, then purchased AFTER that first qualified click. Each
    * stage is an equi join on user_id + a time guard against the previous
    * stage's timestamp — no window over the whole event log, so each stage
    * shuffles only its own event type. */
  val funnel = QueryDef(
    "q_funnel_ordered",
    """WITH v AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
      |  FROM events WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(CAST(ts AS TIMESTAMP)) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |   AND CAST(e.ts AS TIMESTAMP) >= v.t_view
      |  WHERE e.event_type = 'click' GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(CAST(ts AS TIMESTAMP)) AS t_buy
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |   AND CAST(e.ts AS TIMESTAMP) >= c.t_click
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
      |)
      |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
      |       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked_after,
      |       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased_after""".stripMargin) { (s, d) =>
    val ev = T.events(s, d).select("user_id", "ts", "event_type")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v, col("e.user_id") === v("user_id") && col("ts") >= col("t_view"))
      .groupBy(col("e.user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").as("e2")
      .join(c, col("e2.user_id") === c("user_id") && col("ts") >= col("t_click"))
      .groupBy(col("e2.user_id")).agg(min(col("ts")).as("t_buy"))
    v.agg(count(lit(1)).as("n_viewed"))
      .join(c.agg(count(lit(1)).as("n_clicked_after")))
      .join(p.agg(count(lit(1)).as("n_purchased_after")))
  }

  /** Equi-width histogram via width_bucket — the profiling primitive.
    * Bucket boundaries are (v - lo) * n / (hi - lo) arithmetic on doubles;
    * o_totalprice is discrete 2dp money far from any boundary, so the
    * bucket assignment is engine-exact. */
  val histogram = QueryDef(
    "q_a20_histogram",
    """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
      |                  WHEN o_totalprice >= 600000 THEN 25
      |                  ELSE floor(o_totalprice / (CAST(600000 AS DOUBLE) / 24)) + 1
      |             END AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .select(expr("width_bucket(o_totalprice, 0, 600000, 24)").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** The NOT IN + NULL trap, pinned: a NULL in the subquery's result makes
    * NOT IN return no rows (three-valued logic), while NOT EXISTS keeps
    * them — both engines must agree on both branches. */
  val notInNull = QueryDef(
    "q_p9_not_in_null",
    """SELECT CAST((SELECT count(*) FROM customer
      |             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS BIGINT)
      |         AS not_in_count,
      |       CAST((SELECT count(*) FROM customer
      |             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                                     UNION ALL SELECT NULL)) AS BIGINT)
      |         AS not_in_with_null,
      |       CAST((SELECT count(*) FROM customer c
      |             WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                               WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
      |         AS not_exists_count""".stripMargin) { (s, d) =>
    T.customer(s, d).createOrReplaceTempView("customer")
    T.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT CAST((SELECT count(*) FROM customer
        |             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS BIGINT)
        |         AS not_in_count,
        |       CAST((SELECT count(*) FROM customer
        |             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                                     UNION ALL SELECT NULL)) AS BIGINT)
        |         AS not_in_with_null,
        |       CAST((SELECT count(*) FROM customer c
        |             WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                               WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
        |         AS not_exists_count""".stripMargin)
  }

  /** Median absolute deviation — the outlier-robust spread statistic.
    * Two passes: per-group exact median (broadcast back, tiny), then the
    * median of absolute deviations. Exact percentile parity is proven
    * (q_a13); per-row abs/sub double math is bit-identical. */
  val mad = QueryDef(
    "q_a21_mad",
    """WITH med AS (
      |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l.l_returnflag,
      |       quantile_cont(abs(l.l_quantity - m), 0.5) AS mad_qty
      |FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d)
    val med = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("m"))
    li.join(broadcast(med), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(expr("percentile(abs(l_quantity - m), 0.5)").as("mad_qty"))
      .orderBy("l_returnflag")
  }

  /** Weekly retention cohort matrix over purchase activity: users
    * cohorted by their first purchase week, per-(cohort, offset-week)
    * active-user counts and retention rates — the classic product
    * analytics read the funnel doesn't cover. Scale shape: the activity
    * table is DISTINCT (user, week) — one shuffle bounded by users×weeks
    * regardless of event volume; cohorts are a per-user min (equi-join
    * back on user_id); the matrix aggregate needs no distinct because
    * (user, week) is already unique within a (cohort, offset) cell; the
    * cohort-size join broadcasts (|weeks| rows). No windows, no cross
    * joins, nothing corpus-sized past the first distinct. */
  val retentionCohorts = QueryDef(
    "q_ts_retention_cohorts",
    """WITH p AS (
      |  SELECT DISTINCT user_id,
      |         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
      |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
      |), c AS (
      |  SELECT user_id, min(wk) AS cohort_week FROM p GROUP BY user_id
      |), sz AS (
      |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM c GROUP BY cohort_week
      |), a AS (
      |  SELECT c.cohort_week,
      |         CAST(date_diff('day', c.cohort_week, p.wk) // 7 AS BIGINT)
      |           AS offset_weeks,
      |         CAST(count(*) AS BIGINT) AS n_active
      |  FROM p JOIN c USING (user_id)
      |  GROUP BY c.cohort_week, offset_weeks
      |)
      |SELECT a.cohort_week, a.offset_weeks, a.n_active, sz.cohort_size,
      |       CAST(a.n_active AS DOUBLE) / sz.cohort_size AS retention_rate
      |FROM a JOIN sz USING (cohort_week)
      |ORDER BY cohort_week, offset_weeks""".stripMargin) { (s, d) =>
    val p = T.events(s, d)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val c = p.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    val sz = c.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    p.join(c, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(wk, cohort_week) div 7").as("offset_weeks"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sz), "cohort_week")
      .select(col("cohort_week"), col("offset_weeks"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention_rate"))
      .orderBy("cohort_week", "offset_weeks")
  }

  /** M4 time-series downsampling (Jugel et al., VLDB 2014): per series
    * and time bucket keep min, max, first, and last — the four values
    * that make a line chart over the bucket pixel-exact, reducing any
    * event volume to 4·buckets points. Scale shape: bucket assignment is
    * map-only integer arithmetic against a 1-row (t0, t1) broadcast;
    * first/last are struct-min/max aggregates ((t, event_id) ordered —
    * deterministic, no window), so the whole query is one bounded
    * groupBy shuffle. Plan note: struct min/max buffers aren't
    * hash-aggregable, so Spark plans partial+final SortAggregate — the
    * partial STILL runs map-side (the shuffle stays bounded at
    * groups/partition); the cost vs a hash aggregate is an in-partition
    * sort by the group key, measured immaterial here. */
  val m4Downsample = QueryDef(
    "q_ts_m4_downsample",
    """WITH b AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
      |         value, event_id
      |  FROM events
      |), r AS (
      |  SELECT min(t) AS t0, max(t) AS t1 FROM b
      |), x AS (
      |  SELECT event_type,
      |         CAST(((t - t0) * 32) // (t1 - t0 + 1) AS BIGINT) AS bucket,
      |         t, value, event_id
      |  FROM b CROSS JOIN r
      |), m AS (
      |  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_points,
      |         min(value) AS min_v, max(value) AS max_v
      |  FROM x GROUP BY event_type, bucket
      |), f AS (
      |  SELECT event_type, bucket, value AS first_v FROM (
      |    SELECT event_type, bucket, value,
      |           row_number() OVER (PARTITION BY event_type, bucket
      |                              ORDER BY t, event_id) AS rn
      |    FROM x) q WHERE rn = 1
      |), l AS (
      |  SELECT event_type, bucket, value AS last_v FROM (
      |    SELECT event_type, bucket, value,
      |           row_number() OVER (PARTITION BY event_type, bucket
      |                              ORDER BY t DESC, event_id DESC) AS rn
      |    FROM x) q WHERE rn = 1
      |)
      |SELECT m.event_type, m.bucket, m.n_points, m.min_v, m.max_v,
      |       f.first_v, l.last_v
      |FROM m JOIN f USING (event_type, bucket)
      |       JOIN l USING (event_type, bucket)
      |ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
    val b = T.events(s, d).select(col("event_type"),
      expr("unix_micros(ts)").as("t"), col("value"), col("event_id"))
    val r = b.agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    b.crossJoin(broadcast(r))
      .withColumn("bucket", expr("((t - t0) * 32) div (t1 - t0 + 1)"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_points"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        min(struct(col("t"), col("event_id"), col("value"))).as("__f"),
        max(struct(col("t"), col("event_id"), col("value"))).as("__l"))
      .select(col("event_type"), col("bucket"), col("n_points"),
        col("min_v"), col("max_v"),
        col("__f.value").as("first_v"), col("__l.value").as("last_v"))
      .orderBy("event_type", "bucket")
  }

  /** Rolling z-score anomaly detection: per series (event_type), each
    * event scored against the exact mean/std of its preceding 100-row
    * frame; top-20 by |z| reported — the monitoring read every metrics
    * warehouse runs. Determinism discipline: the frame is totally
    * ordered (ts, event_id) and the rolling sums accumulate in DECIMAL
    * (value at 18,2; value² at 28,4 — both exact for this domain), so
    * mean/var/z are per-row double arithmetic on exact inputs —
    * bit-identical cross-engine; var clamps at 0 against float
    * cancellation before sqrt. Scale note: a rolling frame is
    * inherently sequential per series — this shuffles once on the
    * series key and assumes per-series volume is executor-bounded
    * (true for metric streams); a single giant series would instead be
    * range-bucketed by time with 100-row overlap and recomputed per
    * bucket, same results. */
  val rollingZscore = QueryDef(
    "q_ts_rolling_zscore",
    """WITH e AS (
      |  SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events
      |), w AS (
      |  SELECT event_id, event_type, value,
      |         CAST(count(*) OVER f AS BIGINT) AS n,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE)
      |           AS sv,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))
      |                  * CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE)
      |           AS sv2
      |  FROM e
      |  WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
      |               ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
      |), z AS (
      |  SELECT event_id, event_type, value,
      |         (value - sv / n)
      |           / sqrt(greatest(sv2 / n - (sv / n) * (sv / n), 1e-12))
      |           AS zscore
      |  FROM w WHERE n >= 30
      |)
      |SELECT event_id, event_type, value, zscore
      |FROM z
      |ORDER BY abs(zscore) DESC, event_id
      |LIMIT 20""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val f = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(-99, Window.currentRow)
    T.events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .select(col("event_id"), col("event_type"), col("value"),
        count(lit(1)).over(f).as("n"),
        sum(col("value").cast(dec)).over(f).cast("double").as("sv"),
        sum(col("value").cast(dec) * col("value").cast(dec)).over(f)
          .cast("double").as("sv2"))
      .filter(col("n") >= 30)
      .withColumn("zscore",
        (col("value") - col("sv") / col("n"))
          / sqrt(greatest(col("sv2") / col("n")
            - (col("sv") / col("n")) * (col("sv") / col("n")),
            lit(1e-12))))
      .select("event_id", "event_type", "value", "zscore")
      .orderBy(abs(col("zscore")).desc, col("event_id"))
      .limit(20)
  }

  /** Market-basket pair mining: co-occurrence support and lift for
    * event-type pairs within (user, day) baskets — the association read
    * behind "users who did A also did B". Scale shape: baskets reduce to
    * DISTINCT (basket, item) — bounded by baskets × item-vocabulary, not
    * event volume; the pair stage self-joins WITHIN basket only (shuffle
    * keyed on the basket, output ≤ items²/2 per basket — the PPJoin
    * discipline, no cross-basket pairs ever materialize); singleton
    * supports are an item-vocabulary-row broadcast. Counts and ratio
    * arithmetic are exact/deterministic. */
  val pairSupport = QueryDef(
    "q_mb_pair_support",
    """WITH b AS (
      |  SELECT DISTINCT user_id,
      |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type
      |  FROM events WHERE user_id IS NOT NULL
      |), nb AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_baskets
      |  FROM (SELECT DISTINCT user_id, day FROM b) q
      |), singles AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_item FROM b
      |  GROUP BY event_type
      |), pairs AS (
      |  SELECT a.event_type AS item_a, c.event_type AS item_b,
      |         CAST(count(*) AS BIGINT) AS n_pair
      |  FROM b a JOIN b c
      |    ON a.user_id = c.user_id AND a.day = c.day
      |   AND a.event_type < c.event_type
      |  GROUP BY item_a, item_b
      |)
      |SELECT p.item_a, p.item_b, p.n_pair,
      |       CAST(p.n_pair AS DOUBLE) / nb.n_baskets AS support,
      |       CAST(p.n_pair AS DOUBLE) * nb.n_baskets
      |         / (sa.n_item * sb.n_item) AS lift
      |FROM pairs p CROSS JOIN nb
      |JOIN singles sa ON sa.event_type = p.item_a
      |JOIN singles sb ON sb.event_type = p.item_b
      |ORDER BY item_a, item_b""".stripMargin) { (s, d) =>
    val b = T.events(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"))
      .distinct()
    val nb = b.select("user_id", "day").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val singles = b.groupBy("event_type").agg(count(lit(1)).as("n_item"))
    val pairs = b.select(col("user_id"), col("day"),
        col("event_type").as("item_a"))
      .join(b.select(col("user_id"), col("day"),
        col("event_type").as("item_b")), Seq("user_id", "day"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_pair"))
    pairs.crossJoin(broadcast(nb))
      .join(broadcast(singles.select(col("event_type").as("item_a"),
        col("n_item").as("__na"))), Seq("item_a"))
      .join(broadcast(singles.select(col("event_type").as("item_b"),
        col("n_item").as("__nb"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_pair"),
        (col("n_pair").cast("double") / col("n_baskets")).as("support"),
        (col("n_pair").cast("double") * col("n_baskets")
          / (col("__na") * col("__nb"))).as("lift"))
      .orderBy("item_a", "item_b")
  }

  /** Per-series least-squares trend (slope per day, intercept, R²) —
    * the dashboard "is this metric drifting" read. Same determinism
    * discipline as [[corrMoments]]: x is an INTEGER day index against
    * the global min day (1-row broadcast), y is 2dp money, so every
    * moment (x², xy, y²) is exact in DECIMAL(28,4), every moment sum
    * stays far under 2^53 (double-exact cast), and the closed-form
    * slope/intercept/R² are bit-identical per-row double math. Spark's
    * streaming regr_slope is additionally pinned within 1e-9. One
    * groupBy shuffle; moments are map-side partials. */
  val trendFit = QueryDef(
    "q_ts_trend_fit",
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
      |  FROM events
      |), t0 AS (
      |  SELECT min(day) AS d0 FROM e
      |), m AS (
      |  SELECT event_type,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(date_diff('day', d0, day) AS BIGINT))
      |              AS DOUBLE) AS sx,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(date_diff('day', d0, day)
      |                       * date_diff('day', d0, day) AS BIGINT))
      |              AS DOUBLE) AS sxx,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))
      |                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS syy,
      |         CAST(sum(date_diff('day', d0, day)
      |                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      |  FROM e CROSS JOIN t0 GROUP BY event_type
      |)
      |SELECT event_type,
      |       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_per_day,
      |       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
      |         AS intercept,
      |       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2,
      |       true AS builtin_agrees
      |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
    val dec = DecimalType(18, 2)
    val e = T.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val t0 = e.agg(min(col("day")).as("d0"))
    val x = datediff(col("day"), col("d0"))
    val y = col("value").cast(dec)
    val m = e.crossJoin(broadcast(t0)).groupBy("event_type").agg(
      count(lit(1)).cast("double").as("n"),
      sum(x.cast("long")).cast("double").as("sx"),
      sum(y).cast("double").as("sy"),
      sum((x * x).cast("long")).cast("double").as("sxx"),
      sum(y * y).cast("double").as("syy"),
      sum(x * y).cast("double").as("sxy"),
      expr("regr_slope(value, datediff(day, d0))").as("builtin"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col("event_type"),
        slope.as("slope_per_day"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          * (col("n") * col("sxy") - col("sx") * col("sy"))
          / ((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"),
        (abs(slope - col("builtin")) < lit(1e-9)).as("builtin_agrees"))
      .orderBy("event_type")
  }

  /** Sweep-line maximum concurrency per day: sessions are [ts, ts +
    * (user_id % 117 + 3) min); +1/−1 endpoint deltas, a GLOBAL running
    * sum ordered by (time, delta) — ends before starts at equal time,
    * i.e. half-open intervals — and a per-day max of the live count.
    * The textbook SQL form is a single-partition `OVER (ORDER BY t)`
    * window (the oracle); the engine runs ScaleOps.concurrencySweep,
    * whose two-pass prefix sum buckets by day (parallel local windows +
    * a B-row offset table broadcast back), so no partition ever holds
    * the full point set — the q_w3 global-window hazard closed for the
    * cumulative-sum family. */
  val concurrencySweep = QueryDef(
    "q_ts_concurrency_sweep",
    """WITH iv AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS s0,
      |         CAST(ts AS TIMESTAMP)
      |           + (user_id % 117 + 3) * INTERVAL '1 minute' AS e0
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), pts AS (
      |  SELECT s0 AS t, 1 AS d FROM iv
      |  UNION ALL
      |  SELECT e0 AS t, -1 AS d FROM iv
      |), run AS (
      |  SELECT t, CAST(sum(d) OVER (ORDER BY t, d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      |  FROM pts
      |)
      |SELECT CAST(t AS DATE) AS day, max(c) AS max_concurrent
      |FROM run GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val iv = T.events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("ts").as("s0"),
        (col("ts") + expr(
          "make_interval(0,0,0,0,0, CAST(user_id % 117 + 3 AS INT), 0)"))
          .as("e0"))
    graft.ops.ScaleOps.concurrencySweep(iv, "s0", "e0").orderBy("day")
  }

  /** First-order event-transition matrix (the product-analytics Markov
    * estimate): per user, consecutive event pairs via lag ordered by
    * (ts, event_id); transition probability = pair count / from-state
    * total. The lag window is PARTITIONED by user (parallel, one
    * shuffle); the normalizing totals live on the T×T pair table (T =
    * distinct event types, bounded), so the per-from window is over a
    * tiny aggregate, never raw events. */
  val eventTransitions = QueryDef(
    "q_ts_event_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev_type
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), pairs AS (
      |  SELECT prev_type AS from_type, event_type AS to_type,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, n,
      |       CAST(n AS DOUBLE)
      |         / sum(n) OVER (PARTITION BY from_type) AS p
      |FROM pairs
      |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val seq0 = T.events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("prev_type", lag(col("event_type"), 1).over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
    val pairs = seq0.filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("from_type")))
      .orderBy("from_type", "to_type")
  }

  /** Seasonality-aware anomaly detection: the per-(type, hour-of-day)
    * decimal-exact mean is the baseline, each event's residual is value
    * − its slot baseline, and the report is the global top-20 |residual|
    * — q_ts_rolling_zscore's complement (that one flags deviation from
    * the RECENT past; this flags deviation from the SLOT norm, catching
    * "normal for 3pm, wild for 3am"). Baseline is a T×24-row aggregate
    * broadcast back; the top-k plans as TakeOrderedAndProject, so the
    * corpus shuffles once for the baseline and never for the ranking. */
  val seasonalResidual = QueryDef(
    "q_ts_seasonal_residual",
    """WITH base AS (
      |  SELECT event_type,
      |         CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS INT) AS hr,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |           / count(*) AS baseline
      |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT e.event_id, e.event_type, b.hr, e.value, b.baseline,
      |       e.value - b.baseline AS residual
      |FROM events e
      |JOIN base b ON b.event_type = e.event_type
      |  AND b.hr = CAST(extract(hour FROM CAST(e.ts AS TIMESTAMP)) AS INT)
      |WHERE e.value IS NOT NULL AND e.ts IS NOT NULL
      |ORDER BY abs(e.value - b.baseline) DESC, e.event_id
      |LIMIT 20""".stripMargin) { (s, d) =>
    val ev = T.events(s, d)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .withColumn("hr", hour(col("ts")))
    val base = ev.groupBy("event_type", "hr")
      .agg((Fns.dsum(col("value")) / count(lit(1))).as("baseline"))
    ev.join(broadcast(base), Seq("event_type", "hr"))
      .withColumn("residual", col("value") - col("baseline"))
      .select("event_id", "event_type", "hr", "value", "baseline",
        "residual")
      .orderBy(abs(col("residual")).desc, col("event_id"))
      .limit(20)
  }

  val defs: Seq[QueryDef] = Seq(
    semiJoin, antiJoin, rollup, pivot, scalarSubquery, slidingWindow,
    setOps, percentiles, stddevExact, cube, rangeFrame, sqlTextApi, gapFill,
    corrMoments, groupingSets, funnel, histogram, notInNull, mad,
    retentionCohorts, m4Downsample, rollingZscore, pairSupport, trendFit,
    concurrencySweep, eventTransitions, seasonalResidual)
}
