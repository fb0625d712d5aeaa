package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations over a table, dbt-test style: `not_null`,
  * `accepted_values`, `in_range` (row-level), `unique` (key-level) and
  * `references` (cross-table), each reported as one (check, violations,
  * pass) row.
  *
  * The reference ships dbt schema files with no tests declared
  * (`/root/reference/ufc/models/fights/schema.yml` is `version: 2` only) —
  * at 100 TB the absence of declared expectations is itself the gap this
  * fills: a corpus pipeline needs mechanical gates before training data
  * ships.
  *
  * Scale notes: all row-level checks are fused into ONE scan/aggregate
  * (conditional partial sums, whole-stage codegen, no shuffle of data rows
  * — only 8-byte partial counters). `unique` is a single hash aggregate on
  * the key; `references` is a broadcast (dim-sized parent) or shuffle anti
  * join. Nothing collects to the driver.
  */
object Quality {

  /** A named row-level predicate that flags VIOLATING rows. */
  final case class RowCheck(name: String, violated: Column)

  def notNull(c: String): RowCheck = RowCheck(s"not_null:$c", col(c).isNull)

  def acceptedValues(c: String, values: Seq[String]): RowCheck =
    RowCheck(s"accepted_values:$c", !col(c).isin(values: _*) || col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): RowCheck =
    RowCheck(s"in_range:$c", col(c).isNull || col(c) < lo || col(c) > hi)

  /** All row-level checks in one pass over `df`. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty)
    val sums = checks.map(ch =>
      sum(when(ch.violated, 1L).otherwise(0L)).as(ch.name))
    val wide = df.agg(sums.head, sums.tail: _*)
    val stackArgs = checks
      .map(ch => s"'${ch.name}', `${ch.name}`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${checks.size}, $stackArgs) AS (check_name, violations)")
  }

  /** Duplicate-key violations: number of EXCESS rows beyond one per key. */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(col("_n") - 1L), lit(0L))
        .as("violations"))
      .select(lit(s"unique:${keyCols.mkString(",")}").as("check_name"),
        col("violations"))

  /** Referential integrity: child rows whose key has no match in parent
    * (NULL child keys are not orphans, matching dbt `relationships`). */
  def references(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"references:$childKey->$parentKey").as("check_name"),
        col("violations"))

  /** Assemble a suite: union the per-check one-row frames and grade them. */
  def suite(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check_name")
}
