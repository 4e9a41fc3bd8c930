package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch source that re-crawls a non-checkpointable snapshot
  * on every trigger — the reference's `PeriodicSource`
  * (src/Propulsion/Feed/PeriodicSource.fs:13-113):
  *
  *   - the underlying feed has no positions, so each micro-batch is a
  *     full crawl; the offset is just the crawl epoch;
  *   - every crawled item gets a synthetic monotonic index
  *     `basePosition(epoch) + itemNo` with
  *     `basePosition = epoch * 1e9` — the same "traversal-time base
  *     position" codec the reference uses (DateTimeOffset ticks → our
  *     epoch counter), so downstream write-position dedupe works even
  *     though the source itself can't checkpoint;
  *   - a restarted query resumes at the committed epoch: snapshots
  *     already delivered are not re-delivered.
  *
  * Emits (crawl_epoch BIGINT, item_no BIGINT, synthetic_index BIGINT,
  * value STRING) from a line-delimited file.
  */
class PeriodicSnapshotSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PeriodicSnapshotSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PeriodicSnapshotTable(new CaseInsensitiveStringMap(properties))
}

object PeriodicSnapshotSource {
  val BasePositionPerEpoch = 1000000000L
  val schema: StructType = StructType(Seq(
    StructField("crawl_epoch", LongType, nullable = false),
    StructField("item_no", LongType, nullable = false),
    StructField("synthetic_index", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

private[sources] class PeriodicSnapshotTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"periodic(${options.get("path")})"
  override def schema(): StructType = PeriodicSnapshotSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new PeriodicSnapshotScan(opts)
}

private[sources] class PeriodicSnapshotScan(options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = PeriodicSnapshotSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PeriodicSnapshotStream(options.get("path"))
}

private[sources] case class EpochOffset(epoch: Long) extends Offset {
  override def json(): String = epoch.toString
}

private[sources] class PeriodicSnapshotStream(path: String)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = EpochOffset(0L)

  /** In Trigger.AvailableNow mode the engine drains until latestOffset
    * stops advancing — an always-advancing periodic source would never
    * terminate, so the first latestOffset call after prepare() pins the
    * run's target to exactly one more crawl epoch. */
  @volatile private var availableNowArmed = false
  @volatile private var availableNowTarget: Long = -1L

  /** Each trigger advances exactly one crawl epoch past the *actual*
    * start offset (refreshInterval = trigger cadence). Deriving from
    * `start` — not from internally-tracked commit state — keeps restart
    * semantics correct regardless of the engine's call order. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.json().toLong
    if (availableNowArmed) { availableNowTarget = s + 1; availableNowArmed = false }
    if (availableNowTarget >= 0) EpochOffset(math.max(s, math.min(availableNowTarget, s + 1)))
    else EpochOffset(s + 1)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def prepareForTriggerAvailableNow(): Unit = availableNowArmed = true
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")
  override def commit(end: Offset): Unit = ()
  override def deserializeOffset(json: String): Offset = EpochOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.json().toLong
    val e = end.json().toLong
    (s until e).map(epoch => SnapshotCrawlPartition(path, epoch + 1): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new SnapshotCrawlReader(partition.asInstanceOf[SnapshotCrawlPartition])
  override def stop(): Unit = ()
}

private[sources] case class SnapshotCrawlPartition(path: String, epoch: Long)
    extends InputPartition

private[sources] class SnapshotCrawlReader(p: SnapshotCrawlPartition)
    extends PartitionReader[InternalRow] {
  private val reader =
    Files.newBufferedReader(Paths.get(p.path), StandardCharsets.UTF_8)
  private var itemNo = -1L
  private var current: String = _

  override def next(): Boolean = {
    val line = reader.readLine()
    if (line == null) false
    else { itemNo += 1; current = line; true }
  }

  override def get(): InternalRow =
    InternalRow(p.epoch, itemNo,
      p.epoch * PeriodicSnapshotSource.BasePositionPerEpoch + itemNo,
      UTF8String.fromString(current))

  override def close(): Unit = reader.close()
}
