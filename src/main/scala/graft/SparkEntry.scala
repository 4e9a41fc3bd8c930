package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[QueryDef]]
  * in one of the operator modules; this object is just the registry.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    StreamQueries.all ++ RelationalQueries.all ++ EventTimeQueries.all ++
      SimilarityQueries.all ++ TextQueries.all ++ CurationQueries.all ++
      CodecQueries.all ++ ScaleOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StreamQueries.q06StreamHwm.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
