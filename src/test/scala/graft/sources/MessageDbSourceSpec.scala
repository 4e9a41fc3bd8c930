package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import graft.streaming.{InputEvent, ProcessedSpan, StreamProcessor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The JDBC category-poller source against a live embedded Derby
  * message store (reference MessageDbSource semantics,
  * src/Propulsion.MessageDb/MessageDbSource.fs:10-110): category
  * tranches, global_position checkpoints, batchSize paging, tailing
  * pickup of late inserts, and resume-after-restart through the span
  * engine without re-dispatch. */
class MessageDbSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-messagedb-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dbDir = Files.createTempDirectory("msgdb").toString + "/db"
  private val url = s"jdbc:derby:$dbDir"

  private def withDb[A](f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(s"$url;create=true")
    try f(conn) finally conn.close()
  }

  private var nextGlobal = 0L

  /** Append one message, message-db style: stream-local position plus a
    * store-global monotonic global_position. */
  private def insert(conn: java.sql.Connection,
      stream: String, pos: Long, typ: String, data: String): Unit = {
    val st = conn.prepareStatement(
      "INSERT INTO messages VALUES (?, ?, ?, ?, ?, NULL, CURRENT_TIMESTAMP)")
    st.setLong(1, nextGlobal); nextGlobal += 1
    st.setLong(2, pos)
    st.setString(3, stream)
    st.setString(4, typ)
    st.setString(5, data)
    st.executeUpdate()
    st.close()
  }

  override def beforeAll(): Unit = {
    withDb { conn =>
      conn.createStatement().execute(
        """CREATE TABLE messages (
          |  global_position BIGINT NOT NULL PRIMARY KEY,
          |  position BIGINT NOT NULL,
          |  stream_name VARCHAR(255) NOT NULL,
          |  type VARCHAR(128) NOT NULL,
          |  data VARCHAR(4000),
          |  metadata VARCHAR(4000),
          |  time TIMESTAMP NOT NULL)""".stripMargin)
      // interleaved categories; Ledger should never surface (unsubscribed)
      insert(conn, "Account-a1", 0, "Opened", "a1e0")
      insert(conn, "Order-o1", 0, "Placed", "o1e0")
      insert(conn, "Account-a1", 1, "Credited", "a1e1")
      insert(conn, "Ledger-l1", 0, "Noise", "ignored")
      insert(conn, "Account-a2", 0, "Opened", "a2e0")
      insert(conn, "Order-o1", 1, "Shipped", "o1e1")
    }
  }

  private def readFeed() = spark.readStream
    .format("graft.sources.MessageDbSource")
    .option("url", url)
    .option("categories", "Account,Order")
    .option("batchSize", "2")
    .load()

  private def toEvents(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select(col("stream_name").as("streamName"),
        col("stream_position").as("index"),
        col("event_type").as("eventType"),
        col("data"),
        length(col("data")).cast("long").as("size"),
        lit(false).as("isUnfold"))
      .as[InputEvent]
  }

  test("polls categories through the span engine; batchSize pages; tail inserts picked up; restart resumes") {
    import spark.implicits._
    val cp = Files.createTempDirectory("cp-msgdb").toString
    val outDir = Files.createTempDirectory("msgdb-out").toString
    // each run is a FRESH query instance recovering from the same
    // checkpoint (the reference's stop/redeploy cycle); AvailableNow
    // drains to the tail snapshot in batchSize pages, then stops
    def run(): Unit = {
      val q = StreamProcessor.process[String](
        toEvents(readFeed()),
        (_, evs) => evs.map(e => s"${e.index}:${e.data}").mkString("|"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rows() = spark.read.parquet(outDir).as[ProcessedSpan[String]].collect()
      .groupBy(_.streamName).view
      .mapValues(_.sortBy(_.fromIndex).map(r => (r.fromIndex, r.toIndex, r.result)).toList)
      .toMap

    run()
    // every subscribed event arrived, per-stream ordered; batchSize=2
    // paging may split spans but never reorders or loses; Ledger-* is
    // unsubscribed and must not surface
    val r1 = rows()
    assert(r1.keySet == Set("Account-a1", "Account-a2", "Order-o1"))
    assert(r1("Account-a1").map(_._3).mkString("|") == "0:a1e0|1:a1e1")
    assert(r1("Account-a2") == List((0L, 0L, "0:a2e0")))
    assert(r1("Order-o1").map(_._3).mkString("|") == "0:o1e0|1:o1e1")

    // tailing: late inserts surface on the next run, resumed from the
    // committed global_position checkpoint
    withDb { conn =>
      insert(conn, "Account-a1", 2, "Debited", "a1e2")
      insert(conn, "Order-o2", 0, "Placed", "o2e0")
    }
    run()
    val r2 = rows()
    assert(r2("Account-a1").map(_._3).mkString("|") == "0:a1e0|1:a1e1|2:a1e2")
    assert(r2("Order-o2") == List((0L, 0L, "0:o2e0")))

    // restart again: only the post-stop insert surfaces, nothing
    // re-dispatches
    withDb(conn => insert(conn, "Account-a2", 1, "Credited", "a2e1"))
    val before = r2.values.map(_.size).sum
    run()
    val r3 = rows()
    assert(r3("Account-a2").map(_._3).mkString("|") == "0:a2e0|1:a2e1")
    // exactly one new span (the a2 catch-up); no duplicates of old spans
    assert(r3.values.map(_.size).sum == before + 1)
    assert(r3.values.flatten.groupBy(identity).forall(_._2.size == 1))
  }

  test("startFromTail skips the backlog (readTailPositionForTranche semantics)") {
    import spark.implicits._
    val cp = Files.createTempDirectory("cp-msgdb-tail").toString
    val feed = spark.readStream
      .format("graft.sources.MessageDbSource")
      .option("url", url)
      .option("categories", "Account,Order")
      .option("startFromTail", "true")
      .load()
    val q = toEvents(feed).writeStream.format("memory").queryName("msgdb_tail")
      .outputMode("append").option("checkpointLocation", cp).start()
    q.processAllAvailable()
    assert(spark.table("msgdb_tail").count() == 0)
    withDb(conn => insert(conn, "Account-a9", 0, "Opened", "fresh"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("msgdb_tail").as[InputEvent].collect().toList
    assert(got.map(e => (e.streamName, e.index, e.data)) == List(("Account-a9", 0L, "fresh")))
  }
}
