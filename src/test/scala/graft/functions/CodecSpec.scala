package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-codec-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("BodyCodec: deflate/inflate round-trips arbitrary bodies, column + SQL forms") {
    import spark.implicits._
    val bodies = Seq("", "{}", "{\"k\": 42}", "x" * 10000, "üñïçødé \n\t")
    val df = bodies.toDF("body")
      .withColumn("bin", col("body").cast("binary"))
    val roundtrip = df
      .withColumn("packed", BodyCodec.compressBody(col("bin")))
      .withColumn("unpacked", BodyCodec.decompressBody(col("packed")))
      .select(col("body"), col("unpacked").cast("string").as("back"),
        length(col("packed")).as("packed_len"))
      .collect()
    roundtrip.foreach(r => assert(r.getString(0) == r.getString(1)))
    // big repetitive body actually compresses
    assert(roundtrip.find(_.getString(0).length == 10000).get.getInt(2) < 1000)

    BodyCodec.register(spark)
    val viaSql = df.selectExpr("cast(inflate(deflate(bin)) AS STRING) AS back")
      .as[String].collect()
    assert(viaSql.toSeq == bodies)
  }

  test("SpanCodec: render/parse round-trip preserves stream, index, type, data") {
    import spark.implicits._
    val env = Seq(
      ("user-1", 0L, "a", "d0"), ("user-1", 1L, "b", "d1"), ("user-1", 2L, "c", "d2"),
      ("user-2", 5L, "x", "d5"), ("user-2", 6L, "y", "d6"))
      .toDF("stream_name", "idx", "event_type", "data")
    val back = SpanCodec.parseSpans(SpanCodec.renderSpans(env))
      .select("stream_name", "idx", "event_type", "data")
      .as[(String, Long, String, String)].collect().sorted.toList
    assert(back == Seq(
      ("user-1", 0L, "a", "d0"), ("user-1", 1L, "b", "d1"), ("user-1", 2L, "c", "d2"),
      ("user-2", 5L, "x", "d5"), ("user-2", 6L, "y", "d6")).sorted.toList)
    // minimal envelope: t/m omitted on the wire → the compact {c,d} shape
    val json = SpanCodec.renderSpans(env).where(col("stream_name") === "user-2")
      .select("value").as[String].head()
    assert(json == """{"s":"user-2","i":5,"e":[{"c":"x","d":"d5"},{"c":"y","d":"d6"}]}""")
  }

  test("SpanCodec: t (timestamp) and m (meta) ride the wire and round-trip") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 03:04:06.000001")
    val env = Seq(
      ("user-1", 0L, "a", "d0", t0, """{"src":"test"}"""),
      ("user-1", 1L, "b", "d1", t1, null))
      .toDF("stream_name", "idx", "event_type", "data", "ts", "meta")
    val json = SpanCodec.renderSpans(env).select("value").as[String].head()
    // full RenderedSpan event shape {c,t,d,m}; null meta omitted per event
    assert(json.contains(""""t":"2024-01-02T03:04:05.123456Z""""))
    assert(json.contains(""""m":"{\"src\":\"test\"}""""))
    val back = SpanCodec.parseSpans(SpanCodec.renderSpans(env))
      .select("stream_name", "idx", "ts", "meta")
      .as[(String, Long, java.sql.Timestamp, Option[String])]
      .collect().sortBy(_._2).toList
    assert(back == List(
      ("user-1", 0L, t0, Some("""{"src":"test"}""")),
      ("user-1", 1L, t1, None)))
  }
}
