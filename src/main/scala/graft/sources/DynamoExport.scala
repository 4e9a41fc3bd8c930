package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offline import of a DynamoDB S3 table export into index spans — the
  * reference's DynamoDbExport importer
  * (src/Propulsion.DynamoStore/DynamoDbExport.fs:7-78): parse the
  * export's DynamoDB-JSON lines (`Item.p.S` stream, `Item.n.N`
  * version-after, `Item.c.L[].S` batch event types → a span at
  * `i = n − |c|`), buffer out-of-order spans per stream, and flush
  * READY spans in batches bounded by an events-to-write limit while
  * gapped tails stay pending.
  *
  * Spark-first re-expression (no driver-side buffer — the export is a
  * corpus-scale file set):
  *
  *  - the parse is one `from_json` projection over `spark.read.text`
  *    (calf lines without `c` carry no events and drop, as in the
  *    reference where an empty eventTypes span is a no-op);
  *  - buffering becomes event-level dedupe + gaps-and-islands per
  *    stream (exactly the q04 window technique): explode spans to
  *    (p, idx, et) rows, dedupe duplicated export lines by (p, idx),
  *    and split each stream at its gaps — the island containing the
  *    stream's write position (0 for a full import) is READY, later
  *    islands are PENDING with their first-missing index reported,
  *    the same ready/gap split the reference's
  *    DynamoStoreIndex.Buffer.IngestData makes line by line;
  *  - the flush limit becomes within-span chunking: each ready island
  *    re-aggregates into spans of at most `eventsPerBatch` events
  *    (`batch_seq` orders them), so no emitted batch exceeds the
  *    limit — a strictly stronger bound than the reference's
  *    cross-stream takeWhile, and one that keeps every batch
  *    single-stream for the epoch ingester's idempotent append.
  *    Overlap TRIMMING against already-indexed spans is deliberately
  *    left to that ingester (q09_epoch_ingest semantics), mirroring
  *    the reference where AppendsEpoch ingestion dedupes against the
  *    epoch's recorded spans.
  *
  * Every step is a partitioned window or aggregation on the stream
  * key — no unpartitioned windows, no collects; a 100 TB export
  * imports with the cluster.
  */
object DynamoExport {

  private val lineSchema = StructType(Seq(
    StructField("Item", StructType(Seq(
      StructField("p", StructType(Seq(StructField("S", StringType)))),
      StructField("n", StructType(Seq(StructField("N", StringType)))),
      StructField("c", StructType(Seq(
        StructField("L", ArrayType(StructType(Seq(
          StructField("S", StringType)))))))))))))

  /** Parse export JSON lines into spans (p, i, c) — the
    * DynamoDbJsonParser.read projection (DynamoDbExport.fs:16-25).
    * Calf lines (no `c`) drop; duplicated lines survive to the
    * event-level dedupe in [[importSpans]]. */
  def readSpans(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), lineSchema).as("l"))
      .select(
        col("l.Item.p.S").as("p"),
        col("l.Item.n.N").cast("long").as("n"),
        coalesce(col("l.Item.c.L.S"), array()).as("c"))
      .where(size(col("c")) > 0)
      .select(col("p"), (col("n") - size(col("c"))).as("i"), col("c"))

  /** Split parsed spans into (ready, pending):
    * ready = (p, i, c, batch_seq) spans of ≤ `eventsPerBatch` events
    * from each stream's contiguous prefix at `fromPos` (0 = full
    * import); pending = (p, first_missing, n_events) for islands
    * beyond a gap. */
  def importSpans(spans: DataFrame, eventsPerBatch: Int,
      fromPos: Long = 0L): (DataFrame, DataFrame) = {
    require(eventsPerBatch > 0, "eventsPerBatch must be positive")
    val byStream = Window.partitionBy(col("p")).orderBy(col("idx"))
    val islands = spans
      .select(col("p"), col("i"), posexplode(col("c")).as(Seq("pos", "et")))
      .select(col("p"), (col("i") + col("pos")).as("idx"), col("et"))
      // duplicated export lines: same (p, idx) twice with the same
      // event type — keep one
      .groupBy(col("p"), col("idx")).agg(min(col("et")).as("et"))
      // gaps-and-islands: contiguous idx runs share (idx - row_number)
      .withColumn("grp", col("idx") - row_number().over(byStream))
    val withStart = islands
      .withColumn("island_start", min(col("idx")).over(
        Window.partitionBy(col("p"), col("grp"))))
    val ready = withStart
      .where(col("island_start") === lit(fromPos))
      // flush-limit chunking: spans of ≤ eventsPerBatch events, in
      // order (the slice(maxEvents) discipline applied at import)
      .withColumn("batch_seq",
        expr(s"(idx - island_start) div $eventsPerBatch"))
      .groupBy(col("p"), col("batch_seq"))
      .agg(min(col("idx")).as("i"),
        array_sort(collect_list(struct(col("idx"), col("et")))).as("evs"))
      .select(col("p"), col("i"), expr("transform(evs, e -> e.et)").as("c"),
        col("batch_seq"))
    // pending islands report where their buffered run RESUMES — the
    // indices before `buffered_from` are the gap the import waits on
    val pending = withStart
      .where(col("island_start") =!= lit(fromPos))
      .groupBy(col("p"), col("island_start").as("buffered_from"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("p"), col("buffered_from"), col("n_events"))
    (ready, pending)
  }
}
