package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The $all-stream JDBC source against a live embedded Derby store
  * (reference SqlStreamStoreSource semantics,
  * src/Propulsion.SqlStreamStore/SqlStreamStoreSource.fs:14-43):
  * single global-position tranche, NextPosition checkpoints, batchSize
  * pages whose bounds ignore the stream filter, pre-materialization
  * category whitelist, withData=false index-only reads, striped page
  * reads, startFromTail, and the SQL ReaderCheckpoint table. */
class SqlStreamStoreSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sqlstreamstore-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dbDir = Files.createTempDirectory("sqlss").toString + "/db"
  private val url = s"jdbc:derby:$dbDir"

  private def withDb[A](f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(s"$url;create=true")
    try f(conn) finally conn.close()
  }

  private var nextPos = 0L

  /** Append to the $all stream: a store-global monotonic position plus
    * the stream-local version. */
  private def insert(conn: java.sql.Connection,
      stream: String, version: Long, typ: String, data: String): Long = {
    val st = conn.prepareStatement(
      "INSERT INTO messages VALUES (?, ?, ?, ?, ?, NULL, CURRENT_TIMESTAMP, ?)")
    val pos = nextPos; nextPos += 1
    st.setLong(1, pos)
    st.setLong(2, version)
    st.setString(3, stream)
    st.setString(4, typ)
    st.setString(5, data)
    st.setString(6, s"msg-$pos")
    st.executeUpdate()
    st.close()
    pos
  }

  override def beforeAll(): Unit = {
    withDb { conn =>
      conn.createStatement().execute(
        """CREATE TABLE messages (
          |  position BIGINT NOT NULL PRIMARY KEY,
          |  stream_version BIGINT NOT NULL,
          |  stream_name VARCHAR(255) NOT NULL,
          |  type VARCHAR(128) NOT NULL,
          |  data VARCHAR(4000),
          |  metadata VARCHAR(4000),
          |  time TIMESTAMP NOT NULL,
          |  message_id VARCHAR(64))""".stripMargin)
      // interleaved streams; Ledger is unsubscribed in the whitelist
      // test — its rows must still consume positions
      insert(conn, "Account-a1", 0, "Opened", "a1e0")
      insert(conn, "Ledger-l1", 0, "Noise", "ignored")
      insert(conn, "Order-o1", 0, "Placed", "o1e0")
      insert(conn, "Account-a1", 1, "Credited", "a1e1")
      insert(conn, "Ledger-l1", 1, "Noise", "ignored")
      insert(conn, "Order-o1", 1, "Shipped", "o1e1")
    }
  }

  private def readFeed(opts: Map[String, String]) = {
    val r = spark.readStream.format("graft.sources.SqlStreamStoreSource")
      .option("url", url).option("batchSize", "2")
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** Drain with AvailableNow into parquet; fresh query instance per
    * call recovering from `cp` (the stop/redeploy cycle). */
  private def drain(opts: Map[String, String], cp: String, out: String): Unit = {
    val q = readFeed(opts).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def collected(out: String): Seq[(Long, String, Long, String, String)] = {
    import spark.implicits._
    spark.read.parquet(out)
      .select(col("position"), col("stream_name"), col("stream_version"),
        col("event_type"), col("data"))
      .as[(Long, String, Long, String, String)].collect().toSeq.sortBy(_._1)
  }

  test("drains the $all stream in batchSize pages; tail inserts resume from NextPosition") {
    val cp = Files.createTempDirectory("cp-ssall").toString
    val out = Files.createTempDirectory("ssall-out").toString
    drain(Map.empty, cp, out)
    val first = collected(out)
    assert(first.map(_._1) == (0L until 6L), "all six positions, $all order")
    assert(first.map(_._2).toSet ==
      Set("Account-a1", "Ledger-l1", "Order-o1"), "no filter: every stream surfaces")

    // tail append + redeploy: resumes from the committed NextPosition,
    // no re-read of the drained prefix
    withDb { conn => insert(conn, "Account-a2", 0, "Opened", "a2e0") }
    drain(Map.empty, cp, out)
    val second = collected(out)
    assert(second.map(_._1) == (0L until 7L))
    assert(second.count(_._2 == "Account-a2") == 1, "tail insert picked up exactly once")
  }

  test("category whitelist filters pre-materialization; filtered rows still consume positions") {
    val cp = Files.createTempDirectory("cp-sscat").toString
    val out = Files.createTempDirectory("sscat-out").toString
    drain(Map("categories" -> "Account,Order"), cp, out)
    val rows = collected(out)
    assert(!rows.exists(_._2.startsWith("Ledger")), "unsubscribed category never surfaces")
    assert(rows.map(_._2).forall(s => s.startsWith("Account") || s.startsWith("Order")))
    // positions are the $all positions (gaps where Ledger rows sat):
    // the feed advanced THROUGH the filtered messages
    assert(rows.map(_._1).containsSlice(Seq(0L, 2L, 3L)))
    assert(!rows.map(_._1).contains(1L) && !rows.map(_._1).contains(4L))
  }

  test("withData=false is an index-only read: bodies null, index columns intact") {
    import spark.implicits._
    val cp = Files.createTempDirectory("cp-ssidx").toString
    val out = Files.createTempDirectory("ssidx-out").toString
    drain(Map("withData" -> "false"), cp, out)
    val rows = spark.read.parquet(out)
      .select(col("position"), col("event_type"), col("data"), col("metadata"))
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, t, d, m) => t.nonEmpty && d.isEmpty && m.isEmpty },
      "index-only: types present, bodies never read")
  }

  test("striped page reads (readers=4) produce the identical row set; startFromTail skips the backlog") {
    val out1 = Files.createTempDirectory("ssr1-out").toString
    val out4 = Files.createTempDirectory("ssr4-out").toString
    drain(Map("batchSize" -> "100"), Files.createTempDirectory("cp-ssr1").toString, out1)
    drain(Map("batchSize" -> "100", "readers" -> "4"),
      Files.createTempDirectory("cp-ssr4").toString, out4)
    assert(collected(out4) == collected(out1), "striping changes parallelism, not content")

    val outT = Files.createTempDirectory("sst-out").toString
    drain(Map("startFromTail" -> "true"),
      Files.createTempDirectory("cp-sst").toString, outT)
    // the sink may commit an empty batch file; the point is zero ROWS
    val hasFiles = Files.list(java.nio.file.Paths.get(outT)).anyMatch(
      p => p.getFileName.toString.endsWith(".parquet"))
    val tailRows = if (hasFiles) spark.read.parquet(outT).count() else 0L
    assert(tailRows == 0L, "startFromTail: the backlog is never read")
  }

  test("SqlReaderCheckpoint: idempotent creation, update-else-insert commit, per-group isolation") {
    withDb { conn =>
      SqlReaderCheckpoint.createIfNotExists(conn)
      SqlReaderCheckpoint.createIfNotExists(conn) // idempotent
      assert(SqlReaderCheckpoint.tryGetPosition(conn, "$all", "grp1").isEmpty)
      SqlReaderCheckpoint.commitPosition(conn, "$all", "grp1", 41L) // insert path
      SqlReaderCheckpoint.commitPosition(conn, "$all", "grp1", 42L) // update path
      assert(SqlReaderCheckpoint.tryGetPosition(conn, "$all", "grp1").contains(42L))
      assert(SqlReaderCheckpoint.tryGetPosition(conn, "$all", "grp2").isEmpty,
        "consumer groups are isolated")
      SqlReaderCheckpoint.commitPosition(conn, "$all", "grp2", 7L)
      assert(SqlReaderCheckpoint.tryGetPosition(conn, "$all", "grp1").contains(42L))
    }
  }
}
