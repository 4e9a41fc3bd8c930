package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** StreamFilter's values-vs-patterns semantics, pinned to the
  * reference's `isPlain` partition (StreamFilter.fs:16-22): an entry
  * of only letters/digits/underscores is an exact value; anything
  * else is a regex matched UNANCHORED (`Regex.IsMatch` ≙ `rlike`).
  * Deny always wins; empty allow admits the dimension; system (`$`)
  * streams are excluded unless includeSystem.
  */
class StreamFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streamfilter-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import StreamFunctions._

  /** Rows = (stream_name, event_type); returns the stream_names the
    * filter admits, sorted. */
  private def admitted(f: StreamFilter, rows: Seq[(String, String)]): Seq[String] = {
    import spark.implicits._
    rows.toDF("stream_name", "event_type")
      .where(f.predicate(col("stream_name"), col("event_type")))
      .select(col("stream_name")).as[String].collect().toSeq.sorted
  }

  private val rows = Seq(
    "Order-1" -> "Created",   // category Order
    "OrderLine-2" -> "Added", // category OrderLine — a regex 'Order.*' admits it, plain 'Order' must not
    "user-9" -> "click",
    "$stats-0" -> "internal") // system stream

  test("plain entries are exact values, not prefixes") {
    // reference: isPlain('Order') → HashSet.Contains — 'OrderLine' is NOT admitted
    assert(admitted(StreamFilter(allowCategories = Seq("Order")), rows) == Seq("Order-1"))
  }

  test("pattern entries in allowCats admit matching categories (unanchored)") {
    // 'Order.*' has non-plain chars → Regex.IsMatch → admits both Order and OrderLine
    assert(admitted(StreamFilter(allowCategories = Seq("Order.*")), rows) ==
      Seq("Order-1", "OrderLine-2"))
    // 'rder' is all-plain → an exact VALUE → admits nothing (no category equals it)
    assert(admitted(StreamFilter(allowCategories = Seq("rder")), rows).isEmpty)
    // but 'rde.' has a metachar → PATTERN, unanchored → substring-matches both
    assert(admitted(StreamFilter(allowCategories = Seq("rde.")), rows) ==
      Seq("Order-1", "OrderLine-2"))
  }

  test("values and patterns mix within one dimension; deny pattern wins") {
    val f = StreamFilter(
      allowCategories = Seq("user", "Order.*"), // value + pattern
      denyCategories = Seq("OrderL.*"))         // pattern deny beats pattern allow
    assert(admitted(f, rows) == Seq("Order-1", "user-9"))
  }

  test("^\\$ deny still excludes system streams even with includeSystem") {
    // the reference's default denyCats gains '^\$' when system excluded;
    // an EXPLICIT '^\$' deny entry must keep working when includeSystem=true
    val f = StreamFilter(denyStreams = Seq("^\\$"), includeSystem = true)
    assert(admitted(f, rows) == Seq("Order-1", "OrderLine-2", "user-9"))
    // and includeSystem alone admits them
    assert(admitted(StreamFilter(includeSystem = true), rows).contains("$stats-0"))
    // default: system streams out
    assert(!admitted(StreamFilter(), rows).contains("$stats-0"))
  }

  test("regex event-type filter") {
    val f = StreamFilter(allowEventTypes = Seq("C.*d", "click"))
    assert(admitted(f, rows) == Seq("Order-1", "user-9"))
  }
}
