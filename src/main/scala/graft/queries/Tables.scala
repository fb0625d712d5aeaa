package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables
  * (/root/testdata/sf0.01/<name>.parquet etc. — see TESTDATA.md / FIXTURES.md §2).
  * Plain parquet scans: schema comes from the footer, and Catalyst pushes
  * filters/column pruning down into the scan (verified via .explain in
  * PlanSpec) — at 100 TB these become partitioned/bucketed table reads with
  * identical query code.
  */
object T {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = T(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = T(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = T(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = T(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = T(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = T(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = T(s, d, "region")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations. Nanos: Spark's
    * vectorized reader rejects the type, so read it as raw long nanos
    * (legacy conf) and truncate to microseconds — the same truncation
    * DuckDB applies when casting nanos to its native µs timestamps.
    * Integer `div` (not `/`): ns-since-epoch (~1.7e18) exceeds double's
    * 2^53 integer range. Micros: pyarrow writes isAdjustedToUTC=false so
    * Spark infers TIMESTAMP_NTZ — cast to TIMESTAMP (session tz is pinned
    * UTC everywhere, so the cast is value-preserving) because event-time
    * watermarks and the rest of the engine expect the LTZ type, which is
    * also what the nanos branch's timestamp_micros() yields. The branch is
    * on the FOOTER schema, so either generation reads identically
    * downstream. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = T(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = T(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = T(s, d, "embeddings")
}
