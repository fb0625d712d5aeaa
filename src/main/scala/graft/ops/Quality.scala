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

  /** One-pass dataset profiler — the "describe this table" a pipeline runs
    * before deciding what to train on: per column, the row count, null
    * count, exact distinct count, and min/max rendered as strings.
    *
    * Everything is fused into a single aggregation over one scan; the
    * per-column breakout is a driver-free explode over the 1-row result.
    * Exact multi-column COUNT(DISTINCT) makes Catalyst plan an Expand
    * (one duplicated stream per distinct aggregate) — acceptable for a
    * handful of profiled columns; at 100 TB over many columns, switch to
    * `profileColumnsApprox` (HLL sketches, single stream, no Expand). */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    profileWith(df, cols, c => countDistinct(col(c)))
  }

  /** Approximate profiler: HLL++ distinct counts (rsd 1%) — one pass, no
    * Expand, the 100 TB default. No DuckDB oracle (sketch-dependent). */
  def profileColumnsApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumnsApprox needs at least one column")
    profileWith(df, cols, c => approx_count_distinct(col(c), 0.01))
  }

  private def profileWith(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"),
        col(s"__mx_$c").as("max_val"))
    }
    wide.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_val"), col("p.max_val"))
      .orderBy("column_name")
  }

  /** Robust per-group outlier annotation (median/MAD gate — the robust
    * twin of the z-score: one corrupted batch can drag a mean/stddev
    * fence to cover its own anomalies, while median and MAD have 50%
    * breakdown): flags rows with |v − median| > k·MAD of their group.
    * Two exact-percentile passes over the facts plus two BROADCAST
    * joins of the group-bounded stats table — the group count, not the
    * row count, bounds everything that moves; swap `percentile` for
    * `approx_percentile` to make it one-pass-ish when exactness isn't
    * required. MAD = 0 (over half the group identical) flags any
    * deviation, the conventional degenerate reading. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.5): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val stats = df.join(broadcast(med), Seq(groupCol))
      .groupBy(groupCol)
      .agg(max(col("__med")).as("__med"),
        expr(s"percentile(abs($valueCol - __med), 0.5)").as("__mad"))
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("is_outlier",
        abs(col(valueCol) - col("__med")) > lit(k) * col("__mad"))
      .drop("__med", "__mad")
  }
}
