package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join and set-operation families (SURVEY.md §2.3 J1-J8, §2.7 U1-U3)
  * re-expressed over the driver testdata. Join-strategy notes per query:
  * small sides are broadcast (no shuffle); equal-size equi-joins shuffle on
  * the key and AQE handles skew at scale.
  */
object Joins {

  /** J2 + A8 + A9: inner equi-join then multi-key aggregation with a
    * date-diff sum (reference: title_reigns.sql:12-13 join;
    * total_champ_days.sql:16 date arithmetic). At scale this is the classic
    * fact-fact shuffle join on l_orderkey; both sides hash-partition once. */
  val j2JoinAgg = QueryDef(
    "q_j2_join_agg_datediff",
    """SELECT o_orderpriority,
      |       CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_lag_days,
      |       count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(datediff(col("l_shipdate"), col("o_orderdate"))).as("total_lag_days"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }

  /** J3: join a fact against a pre-aggregated per-key totals table with a
    * threshold on the aggregate (reference: clutch_wins.sql:23-29 — winner
    * joined to fighter_totals with total_fights >= 10). The pre-agg side is
    * small after aggregation → broadcast. */
  val j3PreAggJoin = QueryDef(
    "q_j3_preagg_join",
    """WITH cust_totals AS (
      |  SELECT o_custkey, count(*) AS total_orders
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o.o_custkey, count(*) AS big_f_orders
      |FROM orders o
      |JOIN cust_totals t ON o.o_custkey = t.o_custkey
      |WHERE o.o_orderstatus = 'F' AND o.o_totalprice >= 100000
      |  AND t.total_orders >= 10
      |GROUP BY o.o_custkey
      |ORDER BY o.o_custkey""".stripMargin) { (s, d) =>
    val orders = T.orders(s, d)
    val totals = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("total_orders"))
      .filter(col("total_orders") >= 10)
      .select(col("o_custkey").as("t_custkey"))
    orders
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") >= 100000)
      .join(broadcast(totals), col("o_custkey") === col("t_custkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("big_f_orders"))
      .orderBy("o_custkey")
  }

  /** J4: self-join pairing rows that share a key (reference:
    * quality_of_opposition_faced.sql:75-78 — fighter↔opponent pairs per
    * fight_id). Single shuffle on the shared key; pair expansion stays
    * per-partition. */
  val j4SelfJoin = QueryDef(
    "q_j4_self_join_pairs",
    """SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b,
      |       count(*) AS n_pairs,
      |       CAST(sum(CAST(a.l_quantity + b.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
      |FROM lineitem a
      |JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
      |GROUP BY a.l_returnflag, b.l_returnflag
      |ORDER BY flag_a, flag_b""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val a = li.as("a")
    val b = li.as("b")
    a.join(b,
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_linenumber") < col("b.l_linenumber"))
      .groupBy(col("a.l_returnflag").as("flag_a"), col("b.l_returnflag").as("flag_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        Fns.dsum(col("a.l_quantity") + col("b.l_quantity")).as("qty_sum"))
      .orderBy("flag_a", "flag_b")
  }

  /** J5: theta join — equi key plus inequality residual (reference:
    * wins_over_champions.sql:58-60 `champions.fighter = opponent AND
    * first_title_win_date <= event_date`). Planned as a shuffle join on the
    * equi key with the range predicate as residual — never a cartesian. */
  val j5ThetaJoin = QueryDef(
    "q_j5_theta_join",
    """WITH signups AS (
      |  SELECT user_id, min(ts) AS signup_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id
      |)
      |SELECT e.user_id, count(*) AS post_signup_purchases,
      |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
      |FROM events e
      |JOIN signups s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
      |WHERE e.event_type = 'purchase'
      |GROUP BY e.user_id
      |ORDER BY e.user_id""".stripMargin) { (s, d) =>
    val ev = T.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user"))
      .agg(min(col("ts")).as("signup_ts"))
    ev.filter(col("event_type") === "purchase")
      .join(broadcast(signups),
        col("user_id") === col("s_user") && col("ts") >= col("signup_ts"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("post_signup_purchases"),
        Fns.dsum(col("value")).as("purchase_value"))
      .orderBy("user_id")
  }

  /** J6 + W2: fuzzy-match join — equi on a category key plus an OR of
    * exact/containment predicates, scored, then best-match-per-row via
    * row_number (reference: title_reigns.sql:208-248 name resolution). */
  val j6FuzzyJoin = QueryDef(
    "q_j6_fuzzy_join",
    """WITH lookup AS (
      |  SELECT DISTINCT p_type, split_part(p_name, ' ', 1) AS token
      |  FROM part
      |),
      |matches AS (
      |  SELECT p.p_partkey, l.token,
      |         CASE
      |           WHEN lower(split_part(p.p_name, ' ', 1)) = lower(l.token) THEN 3
      |           WHEN lower(p.p_name) LIKE '%' || lower(l.token) || '%' THEN 1
      |           ELSE 0
      |         END AS match_score
      |  FROM part p
      |  JOIN lookup l
      |    ON p.p_type = l.p_type
      |   AND (lower(split_part(p.p_name, ' ', 1)) = lower(l.token)
      |        OR lower(p.p_name) LIKE '%' || lower(l.token) || '%')
      |)
      |SELECT p_partkey, token AS best_token, match_score
      |FROM (
      |  SELECT p_partkey, token, match_score,
      |         row_number() OVER (PARTITION BY p_partkey
      |                            ORDER BY match_score DESC, token) AS match_rank
      |  FROM matches
      |) ranked
      |WHERE match_rank = 1
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val part = T.part(s, d)
    val firstWord = split_part(col("p_name"), lit(" "), lit(1))
    val lookup = part
      .select(col("p_type").as("l_type"), firstWord.as("token"))
      .distinct()
    val score =
      when(lower(split_part(col("p_name"), lit(" "), lit(1))) === lower(col("token")), 3)
        .when(lower(col("p_name")).contains(lower(col("token"))), 1)
        .otherwise(0)
    val matches = part.join(broadcast(lookup),
        col("p_type") === col("l_type") &&
          (lower(split_part(col("p_name"), lit(" "), lit(1))) === lower(col("token")) ||
            lower(col("p_name")).contains(lower(col("token")))))
      .select(col("p_partkey"), col("token"), score.as("match_score"))
    val w = Window.partitionBy("p_partkey")
      .orderBy(col("match_score").desc, col("token").asc)
    matches
      .withColumn("match_rank", row_number().over(w))
      .filter(col("match_rank") === 1)
      .select(col("p_partkey"), col("token").as("best_token"), col("match_score"))
      .orderBy("p_partkey")
  }

  /** J7 + W2: as-of join — for each event, the user's most recent order at
    * or before the event time (reference: title_reigns.sql:273-286
    * status→reign-window join deduped by row_number). Implemented with the
    * union + carry-forward technique: tag both sides, single shuffle on the
    * key, sort by (time, side, orderkey), and last(..., ignoreNulls) carries
    * the latest order forward onto each event row. No per-pair expansion —
    * at 100 TB this is the structural win over join+dedup (the naive plan
    * materializes events × matching-orders before pruning). */
  val j7AsOfJoin = QueryDef(
    "q_j7_asof_join",
    """SELECT event_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
      |FROM (
      |  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e
      |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |) x
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = T.events(s, d).select(
      col("user_id").as("key"), col("ts").as("t"),
      lit(1).as("is_event"), col("event_id"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp").as("o_orderdate"))
    val o = T.orders(s, d).select(
      col("o_custkey").as("key"), col("o_orderdate").as("t"),
      lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
      col("o_orderkey"), col("o_orderdate"))
    // order rows sort before events at equal t (<= semantics); among equal-t
    // orders the max orderkey wins (matches the row_number desc dedup)
    val w = Window.partitionBy("key")
      .orderBy(col("t"), col("is_event"), col("o_orderkey").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = o.unionByName(ev)
      .withColumn("asof", last(
        when(col("is_event") === 0, struct(col("o_orderkey"), col("o_orderdate"))),
        ignoreNulls = true).over(w))
    carried
      .filter(col("is_event") === 1 && col("asof").isNotNull)
      .select(col("event_id"), col("asof.o_orderkey").as("asof_orderkey"),
        col("asof.o_orderdate").as("asof_orderdate"))
      .orderBy("event_id")
  }

  /** J8: left join + null-or-threshold filter — the reference's
    * interim-fallback anti-join idiom (title_reigns.sql:113-120). */
  val j8LeftNullFilter = QueryDef(
    "q_j8_left_null_filter",
    """WITH recent AS (
      |  SELECT o_custkey, max(o_totalprice) AS max_price
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
      |  GROUP BY o_custkey
      |)
      |SELECT c.c_custkey, c.c_mktsegment
      |FROM customer c
      |LEFT JOIN recent r ON c.c_custkey = r.o_custkey
      |WHERE r.max_price IS NULL OR r.max_price < 50000
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    val recent = T.orders(s, d)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .groupBy("o_custkey")
      .agg(max(col("o_totalprice")).as("max_price"))
    T.customer(s, d)
      .join(recent, col("c_custkey") === col("o_custkey"), "left")
      .filter(col("max_price").isNull || col("max_price") < 50000)
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** U1 + U3 + A10: the reference's signature unpivot — UNION ALL of two
    * column slices into one row per (row, role), then distinct-count
    * (reference: dim_fighter.sql:3-13 fighter_1/fighter_2 unpivot, used 9×). */
  val u1Unpivot = QueryDef(
    "q_u1_unpivot_union",
    """WITH entities AS (
      |  SELECT l_partkey AS entity_key, 'part' AS role FROM lineitem
      |  UNION ALL
      |  SELECT l_suppkey AS entity_key, 'supplier' AS role FROM lineitem
      |)
      |SELECT role, count(*) AS n_rows, count(DISTINCT entity_key) AS n_entities
      |FROM entities
      |GROUP BY role
      |ORDER BY role""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d)
    val parts = li.select(col("l_partkey").as("entity_key"), lit("part").as("role"))
    val supps = li.select(col("l_suppkey").as("entity_key"), lit("supplier").as("role"))
    parts.unionByName(supps)
      .groupBy("role")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("entity_key")).as("n_entities"))
      .orderBy("role")
  }

  /** U2: heterogeneous branch merge — two differently-derived sets with a
    * common schema unioned then aggregated (reference: title_reigns.sql:122-140
    * undisputed + interim-fallback reign starts). */
  val u2UnionMerge = QueryDef(
    "q_u2_union_merge",
    """WITH high_value AS (
      |  SELECT o_custkey, o_orderkey, 'high_value' AS tag
      |  FROM orders WHERE o_totalprice >= 150000
      |),
      |latest AS (
      |  SELECT o_custkey, o_orderkey, 'latest' AS tag
      |  FROM (
      |    SELECT o_custkey, o_orderkey,
      |           row_number() OVER (PARTITION BY o_custkey
      |                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders
      |  ) x WHERE rn = 1
      |)
      |SELECT tag, count(*) AS n, count(DISTINCT o_custkey) AS n_cust
      |FROM (SELECT * FROM high_value UNION ALL SELECT * FROM latest) merged
      |GROUP BY tag
      |ORDER BY tag""".stripMargin) { (s, d) =>
    val orders = T.orders(s, d)
    val high = orders.filter(col("o_totalprice") >= 150000)
      .select(col("o_custkey"), col("o_orderkey"), lit("high_value").as("tag"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val latest = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), lit("latest").as("tag"))
    high.unionByName(latest)
      .groupBy("tag")
      .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy("tag")
  }

  /** J11 (beyond ref): big-big point-in-interval join. J5's theta join
    * leans on one side broadcasting; when NEITHER side fits, `ON p
    * BETWEEN lo AND hi` has no equi key and Spark's only direct plan is
    * a cartesian product. ScaleOps.intervalBucketJoin restores an equi
    * key: ranges explode to the fixed-width price buckets they overlap
    * (~1–2 rows each at width 2000), points hash-join their single
    * bucket, and the BETWEEN residual filters inside the bucket — a
    * plain shuffled join, O(|points| + |ranges|·width/W) not
    * |points|·|ranges|. Each qualifying pair meets exactly once (the
    * point's own bucket), so the aggregate needs no dedup. The oracle is
    * the declarative BETWEEN join (DuckDB plans it as an IEJoin).
    * Range width is a FIXED ±$1 band (not a fraction of the price): a
    * relative band makes the expected match count per point grow with
    * the range-table density, i.e. |pairs| ∝ sf² — measured 142 s at
    * sf0.1 before the fix. A fixed absolute band keeps matches-per-point
    * ∝ density only, the shape a real lookup (tolerance match, IP-range,
    * time-window containment) actually has. */
  val j11IntervalBucketJoin = QueryDef(
    "q_j11_interval_bucket_join",
    """WITH r AS (
      |  SELECT o_orderpriority,
      |         o_totalprice / 4.0e0 - 1.0e0 AS lo,
      |         o_totalprice / 4.0e0 + 1.0e0 AS hi
      |  FROM orders WHERE o_totalprice IS NOT NULL
      |)
      |SELECT r.o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
      |            AS DOUBLE) AS sum_price
      |FROM r JOIN lineitem l
      |  ON l.l_extendedprice >= r.lo AND l.l_extendedprice <= r.hi
      |WHERE l.l_extendedprice IS NOT NULL
      |GROUP BY r.o_orderpriority
      |ORDER BY r.o_orderpriority""".stripMargin) { (s, d) =>
    val ranges = T.orders(s, d)
      .filter(col("o_totalprice").isNotNull)
      .select(col("o_orderpriority"),
        (col("o_totalprice") / lit(4.0) - lit(1.0)).as("lo"),
        (col("o_totalprice") / lit(4.0) + lit(1.0)).as("hi"))
    val points = T.lineitem(s, d)
      .filter(col("l_extendedprice").isNotNull)
      .select("l_extendedprice")
    // bucketWidth = the interval width (hi − lo = 2), not 100: the bucket
    // is the equi key, so every point meets every range sharing its
    // bucket and the BETWEEN residual then discards the non-matches — at
    // width 100 that enumerated ~50x more candidate pairs than the ±1
    // band can ever match (guide §2.3: shuffle/enumerate fewer bytes).
    // Width == band keeps range fan-out at ≤2 buckets while candidates
    // shrink to the 2-unit neighborhood; result is width-independent
    // (the residual is exact), only the candidate volume changes.
    graft.ops.ScaleOps.intervalBucketJoin(points, "l_extendedprice",
        ranges, "lo", "hi", bucketWidth = 2.0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val defs: Seq[QueryDef] = Seq(
    j2JoinAgg, j3PreAggJoin, j4SelfJoin, j5ThetaJoin, j6FuzzyJoin,
    j7AsOfJoin, j8LeftNullFilter, u1Unpivot, u2UnionMerge,
    j11IntervalBucketJoin)
}
