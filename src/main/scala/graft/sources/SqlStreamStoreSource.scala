package graft.sources

import java.sql.Connection
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 micro-batch source over a SqlStreamStore-style $all
  * stream — the Spark-native form of the reference's
  * SqlStreamStoreSource
  * (src/Propulsion.SqlStreamStore/SqlStreamStoreSource.fs:14-43), an
  * AllFeedSource reading the WHOLE store in one global-position order:
  *
  *   - one tranche (the $all stream): Position/checkpoint is a single
  *     `NextPosition` long — the exclusive end of the consumed page
  *     (`ReadAllForwards(pos, batchSize)` → `page.NextPosition`,
  *     SqlStreamStoreSource.fs:15,22) — serialized through Spark's
  *     offset/commit log exactly like the reference's
  *     IFeedCheckpointStore position;
  *   - `batchSize` caps positions consumed per trigger (the
  *     ReadAllForwards page size). Page bounds are computed WITHOUT
  *     the stream filter: an unsubscribed message still consumes its
  *     position, as in the reference where the filter runs over the
  *     already-read page (SqlStreamStoreSource.fs:17-20);
  *   - `categories` whitelist = the reference's
  *     `Categories.mapFilters categories streamFilter`
  *     (SqlStreamStoreSource.fs:41) — applied in the store query's
  *     WHERE within the page bounds, i.e. pre-materialization: rows
  *     the filter rejects never leave the database;
  *   - `withData=false` = the reference's withData flag ("the query to
  *     load the events can be much more efficient",
  *     SqlStreamStoreSource.fs:37-38): data/metadata are not selected —
  *     an index-only read producing null bodies, the same IndexOnly
  *     economics as [[IndexHydrate]];
  *   - `startFromTail` = `establishOrigin = ReadHeadPosition + 1`
  *     (SqlStreamStoreSource.fs:24-26,43);
  *   - `readers=K` stripes each page's [from, until) position range
  *     into K contiguous input partitions (the striped-backfill
  *     pattern, cf. [[Backfill]]): position order holds within each
  *     stripe and per-stream order is restored by the span engine's
  *     own sort, so a 100 TB replay reads with K executors instead of
  *     one. Default 1 = the reference's strictly-sequential page.
  *
  * Emits (stream_name, stream_version, position, event_type, data,
  * metadata, time_us, message_id); map to
  * [[graft.streaming.InputEvent]] downstream for the span engine.
  *
  * Scale: every poll is one indexed range probe for the page bound
  * (driver-side scalar), then `readers` indexed range scans
  * executor-side; data rows never pass through the driver.
  */
class SqlStreamStoreSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SqlStreamStoreSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SqlStreamStoreTable(new CaseInsensitiveStringMap(properties))
}

object SqlStreamStoreSource {
  val schema: StructType = StructType(Seq(
    StructField("stream_name", StringType, nullable = false),
    StructField("stream_version", LongType, nullable = false),
    StructField("position", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("data", StringType, nullable = true),
    StructField("metadata", StringType, nullable = true),
    StructField("time_us", LongType, nullable = false),
    StructField("message_id", StringType, nullable = true)))

  /** SqlStreamStore's StreamId is the full stream name; the category
    * convention is the same `{category}-{streamId}` prefix message-db
    * uses (StreamName.internalParseSafe in the reference,
    * SqlStreamStoreSource.fs:18). */
  private[sources] val categoryExpr = MessageDbSource.categoryExpr

  private[sources] def connect(url: String): Connection =
    MessageDbSource.connect(url)
}

/** The reference's SQL ReaderCheckpoint
  * (src/Propulsion.SqlStreamStore/ReaderCheckpoint.fs:18-76): a
  * (stream, consumer_group) → position table with idempotent creation
  * and update-else-insert commit — the external consumer-group
  * checkpoint store SqlStreamStore deployments share between readers.
  * (Spark's own offset log covers the SOURCE's checkpointing; this is
  * the cross-process store the reference exposes alongside it.) */
object SqlReaderCheckpoint {

  /** CREATE TABLE IF NOT EXISTS, portably: Derby/SQL-Server lack the
    * clause, so swallow the table-exists error — same shape as the
    * reference's INFORMATION_SCHEMA guard (ReaderCheckpoint.fs:18-32). */
  def createIfNotExists(conn: Connection): Unit =
    try {
      conn.createStatement().execute(
        """CREATE TABLE checkpoints (
          |  stream VARCHAR(200) NOT NULL,
          |  consumer_group VARCHAR(50) NOT NULL,
          |  position BIGINT,
          |  PRIMARY KEY (stream, consumer_group))""".stripMargin)
    } catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () // exists
    }

  /** UPDATE, else INSERT (ReaderCheckpoint.fs:36-50) — the portable
    * upsert the reference uses instead of MERGE. */
  def commitPosition(conn: Connection, stream: String, group: String,
      position: Long): Unit = {
    val up = conn.prepareStatement(
      "UPDATE checkpoints SET position = ? WHERE stream = ? AND consumer_group = ?")
    up.setLong(1, position); up.setString(2, stream); up.setString(3, group)
    val n = up.executeUpdate(); up.close()
    if (n == 0) {
      val ins = conn.prepareStatement(
        "INSERT INTO checkpoints (stream, consumer_group, position) VALUES (?, ?, ?)")
      ins.setString(1, stream); ins.setString(2, group); ins.setLong(3, position)
      ins.executeUpdate(); ins.close()
    }
  }

  /** Some(position) if the (stream, group) pair has committed
    * (ReaderCheckpoint.fs:56-66 tryGetPosition). */
  def tryGetPosition(conn: Connection, stream: String, group: String): Option[Long] = {
    val st = conn.prepareStatement(
      "SELECT position FROM checkpoints WHERE stream = ? AND consumer_group = ?")
    st.setString(1, stream); st.setString(2, group)
    val rs = st.executeQuery()
    try { if (rs.next() && rs.getObject(1) != null) Some(rs.getLong(1)) else None }
    finally { rs.close(); st.close() }
  }
}

private[sources] class SqlStreamStoreTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"sqlstreamstore(${options.get("url")})"
  override def schema(): StructType = SqlStreamStoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new SqlStreamStoreScan(opts)
}

private[sources] class SqlStreamStoreScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = SqlStreamStoreSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SqlStreamStoreMicroBatchStream(
      options.get("url"),
      Option(options.get("table")).getOrElse("messages"),
      Option(options.get("categories")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
      Option(options.get("batchSize")).map(_.toLong).getOrElse(1000L),
      Option(options.get("withData")).forall(_.toBoolean),
      Option(options.get("readers")).map(_.toInt).getOrElse(1),
      Option(options.get("startFromTail")).exists(_.toBoolean))
}

/** Offset = NextPosition of the $all stream (exclusive end of the
  * consumed prefix). */
private[sources] case class AllStreamOffset(next: Long) extends Offset {
  override def json(): String = s"""{"next":$next}"""
}

private[sources] object AllStreamOffset {
  def parse(json: String): AllStreamOffset =
    AllStreamOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))
}

private[sources] class SqlStreamStoreMicroBatchStream(
    url: String, table: String, categories: Option[Seq[String]],
    batchSize: Long, withData: Boolean, readers: Int, startFromTail: Boolean)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  import SqlStreamStoreSource.connect

  @volatile private var availableNowTail: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTail = Some(headPosition())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** ReadHeadPosition + 1 (SqlStreamStoreSource.fs:24-26): the next
    * position a fresh read would start from. */
  private def headPosition(): Long = {
    val conn = connect(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT MAX(position) FROM $table")
      try { if (rs.next() && rs.getObject(1) != null) rs.getLong(1) + 1L else 0L }
      finally rs.close()
    } finally conn.close()
  }

  /** One page of admission: consume at most batchSize POSITIONS
    * starting at `from` — no stream filter here (filtered messages
    * still advance the feed, as in the reference's page-then-filter). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = AllStreamOffset.parse(start.json()).next
    val tail = availableNowTail.getOrElse(headPosition())
    if (tail <= from) return AllStreamOffset(from)
    val conn = connect(url)
    try {
      val st = conn.prepareStatement(
        s"""SELECT MAX(p) FROM (
           |  SELECT position AS p FROM $table
           |  WHERE position >= ?
           |  ORDER BY position
           |  FETCH FIRST ${batchSize.min(Int.MaxValue)} ROWS ONLY) page""".stripMargin)
      try {
        st.setLong(1, from)
        val rs = st.executeQuery()
        try {
          if (rs.next() && rs.getObject(1) != null)
            AllStreamOffset((rs.getLong(1) + 1L).min(tail))
          else AllStreamOffset(from)
        } finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  override def initialOffset(): Offset =
    if (startFromTail) AllStreamOffset(headPosition()) else AllStreamOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Stripe the page into `readers` contiguous position sub-ranges. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = AllStreamOffset.parse(start.json()).next
    val e = AllStreamOffset.parse(end.json()).next
    if (e <= s) Array.empty
    else {
      val span = e - s
      val k = math.min(readers.toLong, span).toInt
      val step = span / k
      (0 until k).map { i =>
        val from = s + i * step
        val until = if (i == k - 1) e else s + (i + 1) * step
        SqlStreamStorePartition(url, table, categories, withData, from, until)
      }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new SqlStreamStorePartitionReader(partition.asInstanceOf[SqlStreamStorePartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = AllStreamOffset.parse(json)
}

private[sources] case class SqlStreamStorePartition(
    url: String, table: String, categories: Option[Seq[String]],
    withData: Boolean, from: Long, until: Long)
    extends InputPartition

/** One position stripe: executor-side connection, indexed range scan
  * in position order, stream whitelist applied in the store
  * (pre-materialization), bodies skipped entirely when withData=false
  * (the reference's index-only economics). */
private[sources] class SqlStreamStorePartitionReader(p: SqlStreamStorePartition)
    extends PartitionReader[InternalRow] {

  private val conn = SqlStreamStoreSource.connect(p.url)
  private val stmt = {
    val bodyCols = if (p.withData) "data, metadata" else "CAST(NULL AS VARCHAR(1)), CAST(NULL AS VARCHAR(1))"
    val catFilter = p.categories match {
      case Some(cs) if cs.nonEmpty =>
        cs.map(_ => "?").mkString(
          s" AND ${SqlStreamStoreSource.categoryExpr} IN (", ", ", ")")
      case _ => ""
    }
    val st = conn.prepareStatement(
      s"""SELECT stream_name, stream_version, position, type,
         |  $bodyCols, time, message_id
         |FROM ${p.table}
         |WHERE position >= ? AND position < ?$catFilter
         |ORDER BY position""".stripMargin)
    st.setLong(1, p.from)
    st.setLong(2, p.until)
    p.categories.getOrElse(Nil).zipWithIndex.foreach { case (c, i) => st.setString(3 + i, c) }
    st
  }
  private val rs = stmt.executeQuery()

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val ts = rs.getTimestamp(7)
    InternalRow(
      UTF8String.fromString(rs.getString(1)),
      rs.getLong(2),
      rs.getLong(3),
      UTF8String.fromString(rs.getString(4)),
      Option(rs.getString(5)).map(UTF8String.fromString).orNull,
      Option(rs.getString(6)).map(UTF8String.fromString).orNull,
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L,
      Option(rs.getString(8)).map(UTF8String.fromString).orNull)
  }

  override def close(): Unit = {
    rs.close(); stmt.close(); conn.close()
  }
}
