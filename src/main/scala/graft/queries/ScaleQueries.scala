package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

/** Skew-handling under the driver gate: the same deliberately-skewed join
  * (97% of lineitem rows share one hot key) run plain and salted. Both must
  * produce identical results (one oracle SQL shape), which puts
  * ScaleOps.saltedJoin itself under the hash gate; Bench times the pair so
  * SCALING.md's skew claims carry measured numbers.
  */
object ScaleQueries {

  /** Lineitem with a synthetic hot key: l_orderkey % 32 != 0 collapses to
    * key 0 (~97% of rows), the rest keep their own key. */
  private def skewedLeft(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).select(
      when(col("l_orderkey") % 32 =!= 0, lit(0L))
        .otherwise(col("l_orderkey")).as("skew_key"),
      col("l_orderkey"), col("l_extendedprice"))

  /** Dim side: the distinct skewed keys with a derived tag. hint("merge")
    * forces a shuffle join — the skew being demonstrated lives in the
    * shuffle; a broadcast would sidestep it (and at 100 TB the dim may not
    * broadcast). */
  private def dim(left: DataFrame): DataFrame =
    left.select("skew_key").distinct()
      .withColumn("tag", pmod(col("skew_key"), lit(7)))
      .hint("merge")

  private val oracle =
    """WITH l AS (
      |  SELECT CASE WHEN l_orderkey % 32 <> 0 THEN 0 ELSE l_orderkey END AS skew_key,
      |         l_extendedprice
      |  FROM lineitem
      |),
      |dim AS (SELECT DISTINCT skew_key, skew_key % 7 AS tag FROM l)
      |SELECT tag, count(*) AS n,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM l JOIN dim USING (skew_key)
      |GROUP BY tag
      |ORDER BY tag""".stripMargin

  private def aggregate(joined: DataFrame): DataFrame =
    joined.groupBy("tag")
      .agg(count(lit(1)).as("n"), Fns.dsum(col("l_extendedprice")).as("total"))
      .orderBy("tag")

  /** The skewed join as Catalyst plans it (AQE's runtime skew split is the
    * built-in mitigation; measured against the salted form in Bench). */
  val skewPlain = QueryDef("q_scale_skew_plain", oracle) { (s, d) =>
    val left = skewedLeft(s, d)
    aggregate(left.join(dim(left), Seq("skew_key")))
  }

  /** The same join through ScaleOps.saltedJoin: the hot key spreads over 16
    * salt buckets (left side hash-salted on l_orderkey, dim replicated
    * 16×), so no reducer owns 97% of the rows. */
  val saltedJoin = QueryDef("q_scale_salted_join", oracle) { (s, d) =>
    val left = skewedLeft(s, d)
    aggregate(
      ScaleOps.saltedJoin(left, dim(left), "skew_key",
        saltBy = col("l_orderkey"), salts = 16))
  }

  val defs: Seq[QueryDef] = Seq(skewPlain, saltedJoin)
}
