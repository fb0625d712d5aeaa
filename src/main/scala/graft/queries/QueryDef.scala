package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-facing query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. Column names/types are aligned between the two sides —
  * the driver's comparator sorts columns by name and hash-compares values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {
  /** Query with a DuckDB oracle (strong correctness check). */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Non-SQL-expressible op (approximate dedup/ANN etc.) — rows-only check. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

/** Central registry assembled by SparkEntry. */
object Registry {
  lazy val all: Seq[QueryDef] =
    Relational.defs ++ Joins.defs ++ Windows.defs ++ Scalars.defs ++
      NorthStar.defs ++ Streaming.defs ++ UfcQueries.defs ++ Extended.defs ++
      ScaleQueries.defs ++ Lifecycle.defs ++ Retrieve.defs ++ Sketches.defs ++
      GraphQueries.defs ++ TrainPrep.defs ++ CorpusQueries.defs ++
      EmbeddingQueries.defs ++ UrlQueries.defs

  lazy val byName: Map[String, QueryDef] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
