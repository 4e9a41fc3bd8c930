package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase index + hydrate source — the DynamoStoreSource pattern
  * (reference src/Propulsion.DynamoStore/DynamoStoreSource.fs:43-144):
  * an INDEX table holds per-stream span summaries (stream, first index,
  * next index, orderly event-type list); the STORE table holds the full
  * event bodies. Reading proceeds in two phases:
  *
  *  - `IndexOnly` (EventLoadMode.IndexOnly, DynamoStoreSource.fs:115-144):
  *    synthesize the event envelope purely from the index — stream name,
  *    position, event type — never touching the body store. This is the
  *    projection-pushdown mode: at 100 TB it reads the |streams|-scale
  *    index instead of the event-scale store.
  *
  *  - `WithData`: hydrate the synthesized envelope against the store by
  *    (stream, idx) equi-join. The index side is span summaries — orders
  *    of magnitude narrower than the store — so Spark broadcasts it when
  *    small and shuffles both sides on the same (stream, idx) key
  *    otherwise; either way the store scan is pruned to exactly the
  *    hydrating columns (the reference's bounded-parallelism `loadDop`
  *    body loads become ordinary join parallelism).
  */
object IndexHydrate {

  /** Build the index from an event envelope: one row per contiguous
    * island per stream — (stream_name, i, n, types) with `types[k]` the
    * event type at position `i + k` (AppendsEpoch.flatten semantics,
    * src/Propulsion.DynamoStore/AppendsEpoch.fs:45-58). */
  def buildIndex(env: DataFrame): DataFrame = {
    val island = col("idx") - row_number().over(
      Window.partitionBy(col("stream_name")).orderBy(col("idx")))
    env
      .select(col("stream_name"), col("idx"), col("event_type"))
      .withColumn("island", island)
      .groupBy(col("stream_name"), col("island"))
      .agg(min(col("idx")).as("i"), (max(col("idx")) + 1).as("n"),
        expr("transform(array_sort(collect_list(struct(idx, event_type AS c))), x -> x.c)")
          .as("types"))
      .drop("island")
  }

  /** Phase 1 — IndexOnly: the envelope (stream_name, idx, event_type)
    * synthesized from span summaries; the store is never read. */
  def readIndexOnly(index: DataFrame): DataFrame =
    index
      .select(col("stream_name"), col("i"), posexplode(col("types")).as(Seq("pos", "event_type")))
      .select(col("stream_name"), (col("i") + col("pos")).as("idx"), col("event_type"))

  /** Phase 2 — WithData: hydrate bodies from the store by (stream, idx).
    * `bodyCols` prunes the store scan to exactly what's hydrated. */
  def hydrate(index: DataFrame, store: DataFrame, bodyCols: Seq[String]): DataFrame = {
    val bodies = store.select(
      (Seq(col("stream_name"), col("idx")) ++ bodyCols.map(col)): _*)
    readIndexOnly(index).join(bodies, Seq("stream_name", "idx"))
  }
}
