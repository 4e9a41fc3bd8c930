package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 micro-batch source replaying a line-delimited JSON
  * file as a tranche-partitioned feed — the Spark-native form of the
  * reference's Source→FeedReader→checkpoint contract:
  *
  *   - tranche = `lineNo % numTranches` (reference: FeedSource tranches,
  *     src/Propulsion/Feed/FeedSource.fs:10-71) → one input partition
  *     per tranche per micro-batch, read in parallel by executors;
  *   - Position/checkpoint = per-tranche consumed line count
  *     (JsonSource "line number = checkpoint",
  *     src/Propulsion/Feed/JsonSource.fs:14-43), serialized in the
  *     offset JSON and committed through Spark's offset/commit log —
  *     restart resumes exactly where the last committed batch ended;
  *   - `maxLinesPerTrigger` = the read-ahead gate (Ingestion.fs:95-151).
  *
  * Emits (tranche INT, line_no BIGINT, value STRING); payload parsing
  * stays declarative downstream via `from_json`.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.JsonLinesSource")
  *   .option("path", "/data/feed.ndjson")
  *   .option("numTranches", "4")
  *   .option("maxLinesPerTrigger", "1000")
  *   .load()
  * }}}
  */
class JsonLinesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonLinesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JsonLinesTable(new CaseInsensitiveStringMap(properties))
}

object JsonLinesSource {
  val schema: StructType = StructType(Seq(
    StructField("tranche", IntegerType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

private[sources] class JsonLinesTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"jsonlines(${options.get("path")})"
  override def schema(): StructType = JsonLinesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new JsonLinesScan(opts)
}

private[sources] class JsonLinesScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = JsonLinesSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JsonLinesMicroBatchStream(
      options.get("path"),
      Option(options.get("numTranches")).map(_.toInt).getOrElse(4),
      Option(options.get("maxLinesPerTrigger")).map(_.toLong).getOrElse(Long.MaxValue))
}

/** Offset = consumed line count per tranche, e.g. {"0":12,"1":9}. */
private[sources] case class TrancheOffset(positions: Map[Int, Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1)
      .map { case (t, p) => s""""$t":$p""" }.mkString("{", ",", "}")
}

private[sources] object TrancheOffset {
  def parse(json: String): TrancheOffset = TrancheOffset(
    "\"(\\d+)\":(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

private[sources] class JsonLinesMicroBatchStream(
    path: String, numTranches: Int, maxLinesPerTrigger: Long)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Tail snapshot taken when Trigger.AvailableNow starts: the query
    * drains to exactly this point, in rate-limited batches, then stops
    * (the reference's stopAtTail / SinglePassFeedSource contract). */
  @volatile private var availableNowTail: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTail = Some(trancheTails())

  override def getDefaultReadLimit: ReadLimit =
    if (maxLinesPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxLinesPerTrigger)

  /** Admission control: advance each tranche by at most its share of the
    * row budget per micro-batch (read-ahead gate, Ingestion.fs:95-151). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = TrancheOffset.parse(start.json()).positions
    val tail = availableNowTail.getOrElse(trancheTails())
    val perTranche = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows() / numTranches)
      case _ => Long.MaxValue
    }
    TrancheOffset(tail.map { case (t, tl) =>
      val f = from.getOrElse(t, 0L)
      t -> math.min(tl, if (perTranche == Long.MaxValue) tl else f + perTranche)
    })
  }

  // per-tranche total lines currently in the file (the "tail")
  private def trancheTails(): Map[Int, Long] = {
    val counts = new Array[Long](numTranches)
    val reader = Files.newBufferedReader(Paths.get(path), StandardCharsets.UTF_8)
    try {
      var lineNo = 0L
      var line = reader.readLine()
      while (line != null) {
        counts((lineNo % numTranches).toInt) += 1
        lineNo += 1
        line = reader.readLine()
      }
    } finally reader.close()
    (0 until numTranches).map(t => t -> counts(t)).toMap
  }

  override def initialOffset(): Offset =
    TrancheOffset((0 until numTranches).map(_ -> 0L).toMap)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = TrancheOffset.parse(start.json()).positions
    val e = TrancheOffset.parse(end.json()).positions
    (0 until numTranches).flatMap { t =>
      val from = s.getOrElse(t, 0L)
      val until = e.getOrElse(t, 0L)
      if (until > from) Some(JsonLinesPartition(path, numTranches, t, from, until))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[JsonLinesPartition]
      new JsonLinesPartitionReader(p)
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = TrancheOffset.parse(json)
}

private[sources] case class JsonLinesPartition(
    path: String, numTranches: Int, tranche: Int, from: Long, until: Long)
    extends InputPartition

/** Streams its tranche's line range; never materializes the file. */
private[sources] class JsonLinesPartitionReader(p: JsonLinesPartition)
    extends PartitionReader[InternalRow] {

  private val reader =
    Files.newBufferedReader(Paths.get(p.path), StandardCharsets.UTF_8)
  private var globalLineNo = -1L
  private var seenInTranche = -1L
  private var current: String = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      globalLineNo += 1
      if (globalLineNo % p.numTranches == p.tranche) {
        seenInTranche += 1
        if (seenInTranche >= p.until) return false
        if (seenInTranche >= p.from) { current = line; return true }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow =
    InternalRow(p.tranche, seenInTranche, UTF8String.fromString(current))

  override def close(): Unit = reader.close()
}
