package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The DynamoDB S3-export importer (reference DynamoDbExport.fs:7-78):
  * DynamoDB-JSON parse (span at i = n − |c|, calf lines dropped),
  * out-of-order reassembly, duplicate-line dedupe, ready-vs-pending
  * gap split, and the bounded flush batches. */
class DynamoExportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-dynexport-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def line(p: String, n: Long, c: Seq[String]): String = {
    val cl =
      if (c.isEmpty) "" // calf item: no "a"/"c" fields
      else s""","c":{"L":[${c.map(e => s"""{"S":"$e"}""").mkString(",")}]}"""
    s"""{"Item":{"p":{"S":"$p"},"n":{"N":"$n"}$cl}}"""
  }

  test("parses DynamoDB JSON, reassembles out-of-order spans, splits at gaps, bounds batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ddbexp")
    val lines = Seq(
      // stream A, OUT OF ORDER: events 3-4 arrive before 0-2; one line
      // duplicated (a retried export chunk)
      line("Account-a1", 5, Seq("E3", "E4")),
      line("Account-a1", 3, Seq("E0", "E1", "E2")),
      line("Account-a1", 5, Seq("E3", "E4")),
      // calf write: no c field -> no events, dropped (the reference's
      // empty eventTypes span)
      line("Account-a1", 5, Seq.empty),
      // stream B with a GAP: event 0 present, events 2-3 buffered
      line("Order-o1", 1, Seq("P0")),
      line("Order-o1", 4, Seq("P2", "P3")))
    Files.write(Paths.get(dir.toString, "data.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val spans = DynamoExport.readSpans(spark, dir.toString)
    assert(spans.as[(String, Long, Seq[String])].collect().toSet == Set(
      ("Account-a1", 3L, Seq("E3", "E4")),
      ("Account-a1", 0L, Seq("E0", "E1", "E2")),
      ("Order-o1", 0L, Seq("P0")),
      ("Order-o1", 2L, Seq("P2", "P3"))))

    val (ready, pending) = DynamoExport.importSpans(spans, eventsPerBatch = 2)
    val readyRows = ready.as[(String, Long, Seq[String], Long)].collect().toSet
    // A's five events reassemble contiguously and chunk to <= 2 per
    // batch in order; B's ready prefix is just P0
    assert(readyRows == Set(
      ("Account-a1", 0L, Seq("E0", "E1"), 0L),
      ("Account-a1", 2L, Seq("E2", "E3"), 1L),
      ("Account-a1", 4L, Seq("E4"), 2L),
      ("Order-o1", 0L, Seq("P0"), 0L)))
    // B's post-gap island is pending, reported at its resume point
    assert(pending.as[(String, Long, Long)].collect().toSet ==
      Set(("Order-o1", 2L, 2L)))
  }

  test("fromPos resumes a partial import at the stream's write position") {
    import spark.implicits._
    // the index already holds events < 2: the island at 2 is now READY
    val spans = Seq(("S-1", 2L, Seq("X2", "X3", "X4"))).toDF("p", "i", "c")
    val (ready, pending) = DynamoExport.importSpans(spans, 10, fromPos = 2L)
    assert(ready.as[(String, Long, Seq[String], Long)].collect().toSeq ==
      Seq(("S-1", 2L, Seq("X2", "X3", "X4"), 0L)))
    assert(pending.count() == 0L)
  }
}
