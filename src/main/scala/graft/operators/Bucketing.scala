package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) join support: pre-shuffle both sides of a
  * recurring join into the same bucket layout so the join itself needs
  * no Exchange — the 100 TB answer to "this join runs every hour on the
  * same key".
  *
  * Spark's native parquet bucketing (hash(join key) → N buckets,
  * catalog-recorded) is exactly the reference-free way to express
  * "co-located by stream": both tables' bucket files pair up 1:1 and a
  * sort-merge join reads them aligned.
  */
object Bucketing {

  /** Persist `df` bucketed by `keys` into the session catalog. */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket keys. The
    * returned plan contains no shuffle for the join (verify with
    * hasShuffle). */
  def colocatedJoin(
      spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)

  /** True if the physical plan of `df` contains any shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
