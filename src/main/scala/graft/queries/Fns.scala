package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic aggregation helpers.
  *
  * Double SUM/AVG results depend on accumulation order (partition count,
  * engine), so a rounded double sum can flip at a rounding boundary between
  * Spark and the DuckDB oracle. The source money/quantity columns all carry
  * <= 2 fractional decimal digits, so accumulating in DECIMAL is exact and
  * order-independent in BOTH engines; the final cast back to double is then
  * bit-identical. Per-row double arithmetic needs no such treatment (IEEE ops
  * in a fixed expression tree are bit-identical everywhere).
  *
  * At 100 TB this costs one extra cast per row inside the partial aggregate —
  * still whole-stage-codegen'd, still a single shuffle of partial decimal
  * sums.
  */
object Fns {
  /** Exact decimal-accumulated sum of a (<= `scale` dp) double column,
    * returned as double. Oracle side: CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent avg: exact decimal sum, then one double division.
    * Oracle side: CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / count(*). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))
}
