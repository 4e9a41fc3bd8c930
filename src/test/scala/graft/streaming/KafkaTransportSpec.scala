package graft.streaming

import graft.functions.SpanCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Kafka round-trip contract (reference Consumers.fs:48-114 +
  * ProducerSinks.fs): spans rendered with the stream name as message
  * key must survive the transport with per-stream order intact, for
  * ANY legal consumer interleaving of partitions.
  *
  * No broker ships in this container (and no spark-sql-kafka jar), so
  * the topic is an in-memory simulator that implements exactly the
  * guarantees Kafka gives a keyed producer — same key → same partition
  * (deterministic hash of key bytes), per-partition append order, and
  * nothing else (cross-partition interleave is arbitrary) — driven
  * through the REAL producer frame ([[SpanCodec.toKafkaFrame]], the
  * columns `format("kafka")` consumes) and the real parse + span
  * engine on the consumer side.
  */
class KafkaTransportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-kafka-transport-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** The slice of Kafka semantics a keyed producer may rely on. */
  private class SimTopic(numPartitions: Int) {
    private val partitions = Vector.fill(numPartitions)(
      collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])])
    private def partitionOf(key: Array[Byte]): Int =
      math.floorMod(java.util.Arrays.hashCode(key), numPartitions)
    /** One producer round: the (key, value, topic) frame appended in
      * the DataFrame's row order, like a flushed producer batch. */
    def produce(frame: org.apache.spark.sql.DataFrame): Unit =
      frame.select(col("key"), col("value")).collect().foreach { r =>
        val k = r.getAs[Array[Byte]](0)
        partitions(partitionOf(k)) += ((k, r.getAs[Array[Byte]](1)))
      }
    /** Worst-case legal consumer view: partitions interleaved
      * round-robin one message at a time (within a partition, offset
      * order — the only ordering Kafka promises). */
    def consumeInterleaved(): Seq[(String, String)] = {
      val its = partitions.map(_.iterator)
      val out = collection.mutable.ArrayBuffer.empty[(String, String)]
      var any = true
      while (any) {
        any = false
        its.foreach { it =>
          if (it.hasNext) {
            val (k, v) = it.next(); any = true
            out += ((new String(k, "UTF-8"), new String(v, "UTF-8")))
          }
        }
      }
      out.toSeq
    }
    def partitionKeys: Seq[Set[String]] =
      partitions.map(_.map(p => new String(p._1, "UTF-8")).toSet).toSeq
  }

  test("keyed per-stream order survives produce/consume through the span engine") {
    import spark.implicits._
    // two producer rounds over three streams (a busy, b/c sparse)
    def envelope(rows: Seq[(String, Long, String)]) =
      rows.toDF("stream_name", "idx", "event_type")
        .withColumn("data", concat(col("event_type"), lit("@"), col("idx")))
    val round1 = envelope(Seq(
      ("s-a", 0L, "t"), ("s-a", 1L, "t"), ("s-b", 0L, "x"), ("s-c", 0L, "y")))
    val round2 = envelope(Seq(
      ("s-a", 2L, "t"), ("s-a", 3L, "t"), ("s-b", 1L, "x"), ("s-c", 1L, "y")))

    val topic = new SimTopic(numPartitions = 2)
    topic.produce(SpanCodec.toKafkaFrame(SpanCodec.renderSpans(round1), "spans"))
    topic.produce(SpanCodec.toKafkaFrame(SpanCodec.renderSpans(round2), "spans"))

    // Kafka guarantee 1: a stream's messages all landed on one partition
    val keyHomes = topic.partitionKeys
    assert(keyHomes.flatten.toSet == Set("s-a", "s-b", "s-c"))
    for (k <- Seq("s-a", "s-b", "s-c"))
      assert(keyHomes.count(_.contains(k)) == 1, s"$k spread across partitions")

    // consumer side: worst-case interleave → parse → span engine
    val consumed = topic.consumeInterleaved()
    val parsed = SpanCodec.parseSpans(
      consumed.toDF("k", "value"), valueCol = "value")
      .select(col("stream_name").as("streamName"),
        col("idx").cast("long").as("index"),
        col("event_type").as("eventType"), col("data"),
        lit(1L).as("size"), lit(false).as("isUnfold"))
      .as[InputEvent].collect().toVector

    // drive the engine in consumed order (one batch, arrival-ordered)
    val (stA, emA) = StreamProcessor.step[String]("s-a",
      parsed.filter(_.streamName == "s-a"),
      BufferState(0L, Nil, malformed = false),
      (_, evs) => evs.map(_.data).mkString("|"), requireAll = true)
    assert(stA.queue.isEmpty && stA.writePos == 4L)
    assert(emA.flatMap(_.result.split('|')).toList ==
      List("t@0", "t@1", "t@2", "t@3"))

    // every stream replays complete and index-ordered after transport
    for (s <- Seq("s-b", "s-c")) {
      val evs = parsed.filter(_.streamName == s)
      assert(evs.map(_.index).sorted == evs.map(_.index),
        s"$s arrived out of order")
      assert(evs.map(_.index).toList == List(0L, 1L))
    }
  }
}
