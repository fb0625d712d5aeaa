package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Window-function families (SURVEY.md §2.5 W1-W10) over per-customer order
  * sequences. All partitioned windows shuffle once on the partition key and
  * sort within partitions — the same plan shape a 1000-executor cluster
  * runs. The one global-order window (W3) is intentionally scoped to a small
  * filtered set (single-partition sort is the documented scale hazard,
  * SURVEY §7.4.7).
  */
object Windows {

  /** W1 + W10: row_number over a multi-key-tiebroken per-key sequence
    * (reference: title_defenses.sql:36-39; 4-key ordering as in
    * fighters_by_longest_winning_streak.sql:41-44). */
  val w1RowNumber = QueryDef(
    "q_w1_rownum_seq",
    """SELECT o_custkey, o_orderkey, order_seq
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate, o_orderpriority, o_orderkey) AS order_seq
      |  FROM orders
      |) x
      |WHERE order_seq <= 3
      |ORDER BY o_custkey, order_seq""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderpriority"), col("o_orderkey"))
    T.orders(s, d)
      .withColumn("order_seq", row_number().over(w))
      .filter(col("order_seq") <= 3)
      .select("o_custkey", "o_orderkey", "order_seq")
      .orderBy("o_custkey", "order_seq")
  }

  /** W2: top-1-per-group via row_number desc (reference:
    * title_reigns.sql:101-104 latest interim champ). */
  val w2TopPerGroup = QueryDef(
    "q_w2_top1_per_group",
    """SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders
      |) x
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    T.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        col("o_totalprice").as("latest_price"))
      .orderBy("o_custkey")
  }

  /** W3: global (unpartitioned) row_number — synthetic id over a small
    * filtered set (reference: title_reigns.sql:162). Kept deliberately
    * narrow: a global sort is a single-partition bottleneck at 100 TB; the
    * scale path is monotonically_increasing_id or keyed windows. */
  val w3GlobalRowNumber = QueryDef(
    "q_w3_global_rownum",
    """SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS seq_id,
      |       o_orderkey, o_orderdate
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2001-07-01'
      |ORDER BY seq_id""".stripMargin) { (s, d) =>
    val w = Window.orderBy(col("o_orderdate"), col("o_orderkey"))
    T.orders(s, d)
      .filter(col("o_orderdate") >= lit("2001-07-01").cast("timestamp"))
      .select(row_number().over(w).as("seq_id"), col("o_orderkey"), col("o_orderdate"))
      .orderBy("seq_id")
  }

  /** W4 + W5: lag/lead — previous and next order date per customer with the
    * gap in days (reference: title_reigns.sql:82-86 lag, :127-130 lead). */
  val w4LagLead = QueryDef(
    "q_w4_lag_lead",
    """SELECT o_custkey, o_orderkey,
      |       lag(o_orderkey) OVER w AS prev_orderkey,
      |       lead(o_orderkey) OVER w AS next_orderkey,
      |       date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    T.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("days_since_prev"),
        col("o_orderdate"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      .drop("o_orderdate")
  }

  /** W6: dense_rank to pick the dominant group per partition (reference:
    * dominant_style_per_division_year.sql:30-33). */
  val w6DenseRank = QueryDef(
    "q_w6_dense_rank",
    """WITH counts AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
      |         count(*) AS n_orders
      |  FROM orders
      |  GROUP BY 1, 2
      |)
      |SELECT order_year, o_orderpriority AS dominant_priority, n_orders
      |FROM (
      |  SELECT order_year, o_orderpriority, n_orders,
      |         dense_rank() OVER (PARTITION BY order_year
      |                            ORDER BY n_orders DESC, o_orderpriority) AS rk
      |  FROM counts
      |) x
      |WHERE rk = 1
      |ORDER BY order_year""".stripMargin) { (s, d) =>
    val counts = T.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("int").as("order_year"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy("order_year")
      .orderBy(col("n_orders").desc, col("o_orderpriority"))
    counts
      .withColumn("rk", dense_rank().over(w))
      .filter(col("rk") === 1)
      .select(col("order_year"), col("o_orderpriority").as("dominant_priority"),
        col("n_orders"))
      .orderBy("order_year")
  }

  /** W7 + A5 + A7: gaps-and-islands — the reference's signature streak
    * technique (fighters_by_longest_winning_streak.sql:45-74,
    * consecutive_title_defenses.sql:65-93): running sum of "breaks" forms a
    * group id, count inside each island, max per key, threshold filter. */
  val w7GapsIslands = QueryDef(
    "q_w7_gaps_islands",
    """WITH ordered AS (
      |  SELECT o_custkey, o_orderstatus,
      |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
      |              OVER (PARTITION BY o_custkey
      |                    ORDER BY o_orderdate, o_orderkey
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS break_group
      |  FROM orders
      |),
      |streaks AS (
      |  SELECT o_custkey, break_group, count(*) AS streak_len
      |  FROM ordered
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY o_custkey, break_group
      |)
      |SELECT o_custkey, max(streak_len) AS longest_f_streak
      |FROM streaks
      |GROUP BY o_custkey
      |HAVING max(streak_len) >= 4
      |ORDER BY longest_f_streak DESC, o_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.orders(s, d)
      .withColumn("break_group",
        sum(when(col("o_orderstatus") === "F", 0).otherwise(1)).over(w))
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey", "break_group")
      .agg(count(lit(1)).as("streak_len"))
      .groupBy("o_custkey")
      .agg(max(col("streak_len")).as("longest_f_streak"))
      .filter(col("longest_f_streak") >= 4)
      .orderBy(col("longest_f_streak").desc, col("o_custkey"))
  }

  /** W8 + W9: point-in-time running frame (unbounded preceding → 1 preceding)
    * plus whole-partition sum with no ORDER BY (reference:
    * quality_of_opposition_faced.sql:49-59 prior record + career wins).
    * Money accumulations run in DECIMAL for cross-engine determinism. */
  val w8PriorFrame = QueryDef(
    "q_w8_pit_prior_frame",
    """SELECT o_custkey, o_orderkey,
      |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |              OVER (PARTITION BY o_custkey
      |                    ORDER BY o_orderdate, o_orderkey
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) AS prior_spend,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |              OVER (PARTITION BY o_custkey) AS DOUBLE) AS career_spend
      |FROM orders
      |WHERE o_custkey < 200
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val dec = col("o_totalprice").cast(DecimalType(18, 2))
    val wPrior = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("o_custkey")
    T.orders(s, d)
      .filter(col("o_custkey") < 200)
      .select(
        col("o_custkey"), col("o_orderkey"),
        coalesce(sum(dec).over(wPrior), lit(0)).cast("double").as("prior_spend"),
        sum(dec).over(wAll).cast("double").as("career_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist plus
    * nth_value/first/last over the full-partition frame. percent_rank and
    * cume_dist are per-row integer ratios ((rank-1)/(n-1), rank_hi/n) —
    * bit-identical across engines without decimal help. */
  val w10Distribution = QueryDef(
    "q_w10_distribution",
    """SELECT c_nationkey, c_custkey,
      |       ntile(4) OVER w AS quartile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume,
      |       nth_value(c_custkey, 2) OVER
      |         (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest,
      |       first_value(c_custkey) OVER w AS richest,
      |       last_value(c_custkey) OVER
      |         (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, pct_rank, c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.customer(s, d)
      .select(
        col("c_nationkey"), col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        nth_value(col("c_custkey"), 2).over(wFull).as("second_richest"),
        first(col("c_custkey")).over(w).as("richest"),
        last(col("c_custkey")).over(wFull).as("poorest"))
      .orderBy(col("c_nationkey"), col("pct_rank"), col("c_custkey"))
  }

  val defs: Seq[QueryDef] = Seq(
    w1RowNumber, w2TopPerGroup, w3GlobalRowNumber, w4LagLead, w6DenseRank,
    w7GapsIslands, w8PriorFrame, w10Distribution)
}
