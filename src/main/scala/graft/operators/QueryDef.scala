package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One testable query: a Spark builder plus (optionally) the equivalent
  * ANSI SQL the DuckDB oracle runs over the same parquet tables.
  *
  * Column names/aliases must match between the two — the harness sorts
  * columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
