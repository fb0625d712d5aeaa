package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique operators (SCALING.md): explicit skew salting and
  * bucketed co-located joins. AQE handles moderate skew automatically;
  * these are the deliberate tools for the pathological cases a 100 TB
  * pipeline hits (one hot user, one hot join key) and for amortizing the
  * shuffle of a repeatedly-joined fact table.
  */
object ScaleOps {

  /** Salted equi-join for a skewed LEFT side: the left side deterministically
    * salts each row by hashing `saltBy` into `salts` buckets; the right side
    * replicates `salts`× via explode. One hot key now spreads over `salts`
    * reducers. Deterministic (hash salt, not rand()) so results are
    * reproducible and oracle-comparable. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage (salted) aggregation for skewed group keys: partial
    * aggregation per (key, salt) then final merge per key. For algebraic
    * aggregates Spark's partial aggregation already does this implicitly;
    * the explicit form is for holistic aggregates (exact distinct via
    * two-stage set union) where the partial step isn't automatic. */
  def saltedDistinctCount(df: DataFrame, key: String, distinctCol: String,
      saltBy: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(distinctCol)).as("__partial"))
      .groupBy(col(key))
      .agg(size(array_distinct(flatten(collect_list(col("__partial")))))
        .cast("long").as(s"n_distinct_$distinctCol"))

  /** Bucketed, sorted table write: subsequent equi-joins between tables
    * bucketed on the same key plan WITHOUT a shuffle (verified in
    * ScaleSpec). The 100 TB idiom for fact tables joined every run. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two same-key bucketed tables — bucket-local sort-merge join,
    * zero Exchange. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Hive-style column-partitioned parquet write — the other table-layout
    * idiom next to bucketing: a predicate on the partition column becomes a
    * directory prune (PartitionFilters) before any file is opened, so a
    * one-day query over a years-deep 100 TB table reads one directory.
    * Verified in ScaleSpec (plan shows the filter under PartitionFilters,
    * not PushedFilters). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
