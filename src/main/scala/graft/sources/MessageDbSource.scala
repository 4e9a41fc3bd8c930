package graft.sources

import java.sql.{Connection, DriverManager}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 micro-batch source polling a message-store table over
  * JDBC, one tranche per CATEGORY — the Spark-native form of the
  * reference's MessageDbSource category poller
  * (src/Propulsion.MessageDb/MessageDbSource.fs:10-110):
  *
  *   - tranche = category (the `{category}-{streamId}` prefix of
  *     stream_name, computed in SQL exactly like message-db's
  *     `category(stream_name)`) → one input partition per category per
  *     micro-batch, each read by an executor over its own connection;
  *   - Position/checkpoint = `global_position + 1` of the last consumed
  *     row per category (MessageDbSource.fs:64: "global_position is
  *     passed through ... for checkpointing"), serialized in the offset
  *     JSON and committed through Spark's offset/commit log — restart
  *     resumes exactly where the last committed batch ended;
  *   - `batchSize` caps rows per category per trigger (the
  *     `get_category_messages($1,$2,$3)` page, MessageDbSource.fs:11-13);
  *   - `startFromTail=true` = the reference's startFromTail: the initial
  *     offset snapshot is each category's `max(global_position)+1`
  *     (MessageDbSource.fs:79-81 readTailPositionForTranche).
  *
  * Emits (category, stream_name, stream_position, event_type, data,
  * metadata, time_us, global_position); map to
  * [[graft.streaming.InputEvent]] downstream for the span engine.
  *
  * Scale: the poll queries are one indexed range scan per category per
  * trigger; data never passes through the driver (the driver only reads
  * per-category MAX(global_position) tails). Category count bounds the
  * read parallelism exactly as in the reference, where a tranche is the
  * unit of fairness.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.MessageDbSource")
  *   .option("url", "jdbc:derby:/tmp/msgdb")
  *   .option("categories", "Account,Order")
  *   .option("batchSize", "1000")
  *   .load()
  * }}}
  */
class MessageDbSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MessageDbSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MessageDbTable(new CaseInsensitiveStringMap(properties))
}

object MessageDbSource {
  val schema: StructType = StructType(Seq(
    StructField("category", StringType, nullable = false),
    StructField("stream_name", StringType, nullable = false),
    StructField("stream_position", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("data", StringType, nullable = true),
    StructField("metadata", StringType, nullable = true),
    StructField("time_us", LongType, nullable = false),
    StructField("global_position", LongType, nullable = false)))

  /** message-db's `category(stream_name)`: the prefix before the first
    * dash (standard ANSI SQL so Derby/Postgres/H2 all accept it). */
  private[sources] val categoryExpr =
    "SUBSTR(stream_name, 1, LOCATE('-', stream_name) - 1)"

  private[sources] def connect(url: String): Connection = {
    // Derby's embedded driver doesn't always self-register under JDK17
    // module loading; harmless no-op for other drivers/urls
    if (url.startsWith("jdbc:derby"))
      try Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
      catch { case _: ClassNotFoundException => () }
    DriverManager.getConnection(url)
  }
}

private[sources] class MessageDbTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"messagedb(${options.get("url")})"
  override def schema(): StructType = MessageDbSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new MessageDbScan(opts)
}

private[sources] class MessageDbScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = MessageDbSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MessageDbMicroBatchStream(
      options.get("url"),
      Option(options.get("table")).getOrElse("messages"),
      Option(options.get("categories")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(throw new IllegalArgumentException("categories option is required")),
      Option(options.get("batchSize")).map(_.toLong).getOrElse(1000L),
      Option(options.get("startFromTail")).exists(_.toBoolean))
}

/** Offset = next global_position (exclusive end of what's consumed) per
  * category, e.g. {"Account":12,"Order":9}. */
private[sources] case class CategoryOffset(positions: Map[String, Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1)
      .map { case (c, p) => s""""$c":$p""" }.mkString("{", ",", "}")
}

private[sources] object CategoryOffset {
  def parse(json: String): CategoryOffset = CategoryOffset(
    "\"([^\"]+)\":(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap)
}

private[sources] class MessageDbMicroBatchStream(
    url: String, table: String, categories: Seq[String],
    batchSize: Long, startFromTail: Boolean)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  import MessageDbSource.{categoryExpr, connect}

  @volatile private var availableNowTail: Option[Map[String, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTail = Some(categoryTails())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Per-category tail = max(global_position) + 1 (the next position a
    * fresh read would start from; MessageDbSource.fs:79-81). */
  private def categoryTails(): Map[String, Long] = {
    val conn = connect(url)
    try {
      val st = conn.prepareStatement(
        s"SELECT MAX(global_position) FROM $table WHERE $categoryExpr = ?")
      try categories.map { c =>
        st.setString(1, c)
        val rs = st.executeQuery()
        val tail = try { if (rs.next() && rs.getObject(1) != null) rs.getLong(1) + 1L else 0L }
        finally rs.close()
        c -> tail
      }.toMap
      finally st.close()
    } finally conn.close()
  }

  /** Admission control: advance each category by at most `batchSize`
    * rows of its range (the get_category_messages page size). The cap
    * is resolved with one indexed scan per category, driver-side, rows
    * never materialized. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = CategoryOffset.parse(start.json()).positions
    val tails = availableNowTail.getOrElse(categoryTails())
    val conn = connect(url)
    try {
      val st = conn.prepareStatement(
        s"""SELECT MAX(gp) FROM (
           |  SELECT global_position AS gp FROM $table
           |  WHERE $categoryExpr = ? AND global_position >= ?
           |  ORDER BY global_position
           |  FETCH FIRST ${batchSize.min(Int.MaxValue)} ROWS ONLY) page""".stripMargin)
      try {
        CategoryOffset(categories.map { c =>
          val f = from.getOrElse(c, 0L)
          val tail = tails.getOrElse(c, 0L)
          if (tail <= f) c -> f
          else {
            st.setString(1, c)
            st.setLong(2, f)
            val rs = st.executeQuery()
            val end = try {
              if (rs.next() && rs.getObject(1) != null) (rs.getLong(1) + 1L).min(tail) else f
            } finally rs.close()
            c -> end
          }
        }.toMap)
      } finally st.close()
    } finally conn.close()
  }

  override def initialOffset(): Offset =
    if (startFromTail) CategoryOffset(categoryTails())
    else CategoryOffset(categories.map(_ -> 0L).toMap)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = CategoryOffset.parse(start.json()).positions
    val e = CategoryOffset.parse(end.json()).positions
    categories.flatMap { c =>
      val from = s.getOrElse(c, 0L)
      val until = e.getOrElse(c, 0L)
      if (until > from) Some(MessageDbPartition(url, table, c, from, until))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new MessageDbPartitionReader(partition.asInstanceOf[MessageDbPartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = CategoryOffset.parse(json)
}

private[sources] case class MessageDbPartition(
    url: String, table: String, category: String, from: Long, until: Long)
    extends InputPartition

/** One category page: executor-side connection, indexed range scan in
  * global_position order (the reference's parseRow column set,
  * MessageDbSource.fs:43-55). */
private[sources] class MessageDbPartitionReader(p: MessageDbPartition)
    extends PartitionReader[InternalRow] {

  private val conn = MessageDbSource.connect(p.url)
  private val stmt = {
    val st = conn.prepareStatement(
      s"""SELECT stream_name, position, type, data, metadata, time, global_position
         |FROM ${p.table}
         |WHERE ${MessageDbSource.categoryExpr} = ?
         |  AND global_position >= ? AND global_position < ?
         |ORDER BY global_position""".stripMargin)
    st.setString(1, p.category)
    st.setLong(2, p.from)
    st.setLong(3, p.until)
    st
  }
  private val rs = stmt.executeQuery()

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val ts = rs.getTimestamp(6)
    InternalRow(
      UTF8String.fromString(p.category),
      UTF8String.fromString(rs.getString(1)),
      rs.getLong(2),
      UTF8String.fromString(rs.getString(3)),
      Option(rs.getString(4)).map(UTF8String.fromString).orNull,
      Option(rs.getString(5)).map(UTF8String.fromString).orNull,
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L,
      rs.getLong(7))
  }

  override def close(): Unit = {
    rs.close(); stmt.close(); conn.close()
  }
}
