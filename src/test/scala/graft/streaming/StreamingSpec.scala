package graft.streaming

import java.nio.file.Files

import graft.model.Envelope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic streaming-engine tests over MemoryStream (the
  * reference's MemoryStoreSource + AwaitCompletion pattern,
  * DOCUMENTATION.md:511-521) and the JsonLinesSource DSv2 connector. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("StreamProcessor: per-stream ordering, write-pos dedupe across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[InputEvent]
    val out = StreamProcessor.process[String](
      input.toDS(),
      (s, evs) => evs.map(e => s"${e.index}:${e.eventType}").mkString("|"))
    val q = out.writeStream.format("memory").queryName("proc_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-proc")).start()

    // batch 1: stream a events 0-2, stream b events 0-1
    input.addData(
      InputEvent("a", 0, "t0", "", 1, isUnfold = false),
      InputEvent("a", 1, "t1", "", 1, isUnfold = false),
      InputEvent("a", 2, "t2", "", 1, isUnfold = false),
      InputEvent("b", 0, "x0", "", 1, isUnfold = false),
      InputEvent("b", 1, "x1", "", 1, isUnfold = false))
    q.processAllAvailable()
    // batch 2: redeliver a's 1-2 (must be dropped) plus new 3-4; b gapped 3
    input.addData(
      InputEvent("a", 1, "t1", "", 1, isUnfold = false),
      InputEvent("a", 2, "t2", "", 1, isUnfold = false),
      InputEvent("a", 3, "t3", "", 1, isUnfold = false),
      InputEvent("a", 4, "t4", "", 1, isUnfold = false),
      InputEvent("b", 3, "x3", "", 1, isUnfold = false))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("proc_out").as[ProcessedSpan[String]].collect()
      .groupBy(_.streamName).view.mapValues(_.sortBy(_.fromIndex).toList).toMap
    // stream a: [0..2] then the deduped [3..4]
    assert(rows("a").map(r => (r.fromIndex, r.toIndex, r.result)) ==
      List((0L, 2L, "0:t0|1:t1|2:t2"), (3L, 4L, "3:t3|4:t4")))
    // stream b: [0..1]; gapped 3 dispatched as its own span (default mode)
    assert(rows("b").map(r => (r.fromIndex, r.toIndex)) == List((0L, 1L), (3L, 3L)))
  }

  test("StreamProcessor: snapshot refresh at an unchanged write position re-dispatches with a bumped revision") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[InputEvent]
    val out = StreamProcessor.process[String](
      input.toDS(),
      (_, evs) => evs.map(e => s"${e.index}${if (e.isUnfold) "u" else ""}:${e.data}").mkString("|"))
    val q = out.writeStream.format("memory").queryName("rev_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-rev")).start()

    // batch 1: events 0-2 plus the accompanying snapshot; unfolds bear
    // Index = next write position (reference parser convention:
    // EquinoxSystemTextJsonParser.fs:51-52 `gen true batch.n`)
    input.addData(
      InputEvent("a", 0, "t", "e0", 1, isUnfold = false),
      InputEvent("a", 1, "t", "e1", 1, isUnfold = false),
      InputEvent("a", 2, "t", "e2", 1, isUnfold = false),
      InputEvent("a", 3, "snap", "v1", 1, isUnfold = true))
    q.processAllAvailable()
    // batch 2: a FRESH snapshot at the SAME position (the ChangeFeed
    // redelivering an updated tip without new events) — must be
    // re-dispatched, not swallowed by write-position dedupe
    input.addData(InputEvent("a", 3, "snap", "v2", 1, isUnfold = true))
    q.processAllAvailable()
    // batch 3: redelivery of already-handled EVENTS only: swallowed
    input.addData(
      InputEvent("a", 1, "t", "e1", 1, isUnfold = false),
      InputEvent("a", 2, "t", "e2", 1, isUnfold = false))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("rev_out").as[ProcessedSpan[String]].collect()
      .sortBy(_.revision).toList
    assert(rows.map(r => (r.fromIndex, r.toIndex, r.handledUnfolds, r.result)) == List(
      (0L, 3L, 1, "0:e0|1:e1|2:e2|3u:v1"),
      (3L, 3L, 1, "3u:v2")))
    // the refresh dispatched against a strictly later queue revision, so
    // the first handling's HandlerProgress cannot satisfy a requirement
    // computed from the refreshed state
    val List(first, second) = rows
    assert(second.revision > first.revision)
    val stale = graft.core.HandlerProgress(3, first.revision)
    val fresh = graft.core.HandlerProgress(3, second.revision)
    val req = graft.core.ProgressRequirement.ofPosUnfoldRevision(3, second.revision)
    assert(!graft.core.ProgressRequirement.isSatisfiedBy(stale)(req))
    assert(graft.core.ProgressRequirement.isSatisfiedBy(fresh)(req))
  }

  test("streaming tumbling window equals the batch q16 oracle shape") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val streamed = input.toDS()
      .toDF("event_id", "ts", "user_id", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(concat(lit("user-"), col("user_id")).as("stream_name"),
        window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("stream_name"), unix_micros(col("window.start")).as("ws"), col("n"))
    val q = streamed.writeStream.format("memory").queryName("win_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-win")).start()
    input.addData(events.toIndexedSeq)
    q.processAllAvailable()
    // push the watermark far past the data so every window finalizes
    input.addData((999999L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 9999L, 0.0))
    q.processAllAvailable()
    q.stop()

    val batch = Envelope.fromEvents(
      Envelope.readTable(spark, "/root/testdata/sf0.001", "events"))
      .groupBy(col("stream_name"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("stream_name"), unix_micros(col("window.start")).as("ws"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    val stream = spark.table("win_out").as[(String, Long, Long)].collect().toSet
      .filterNot(_._1 == "user-9999")
    assert(stream == batch)
  }

  test("streaming session windows equal the batch q16_session oracle shape") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val streamed = input.toDS()
      .toDF("event_id", "ts", "user_id", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(concat(lit("user-"), col("user_id")).as("stream_name"),
        session_window(col("ts"), "1 hour"))
      .agg(min(unix_micros(col("ts"))).as("start_us"), count(lit(1)).as("n"))
      .select(col("stream_name"), col("start_us"), col("n"))
    val q = streamed.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-sess")).start()
    input.addData(events.toIndexedSeq)
    q.processAllAvailable()
    // push the watermark far past the data so every session finalizes
    input.addData((999999L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 9999L, 0.0))
    q.processAllAvailable()
    q.stop()

    val batch = graft.operators.EventTimeQueries.q16Session
      .build(spark, "/root/testdata/sf0.001")
      .select(col("stream_name"), col("session_start_us"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    val stream = spark.table("sess_out").as[(String, Long, Long)].collect().toSet
      .filterNot(_._1 == "user-9999")
    assert(stream == batch)
  }

  test("streaming sliding windows equal the batch q16_sliding aggregates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val streamed = input.toDS()
      .toDF("event_id", "ts", "user_id", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(concat(lit("user-"), col("user_id")).as("stream_name"),
        window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(value AS DECIMAL(20,4))")).cast("double").as("sum_value"))
      .select(col("stream_name"), unix_micros(col("window.start")).as("ws"),
        col("n"), col("sum_value"))
    val q = streamed.writeStream.format("memory").queryName("slide_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-slide")).start()
    input.addData(events.toIndexedSeq)
    q.processAllAvailable()
    // push the watermark far past the data so every window finalizes
    input.addData((999999L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 9999L, 0.0))
    q.processAllAvailable()
    q.stop()

    val batch = graft.operators.EventTimeQueries.q16Sliding
      .build(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double)].collect().toSet
    val stream = spark.table("slide_out").as[(String, Long, Long, Double)]
      .collect().toSet.filterNot(_._1 == "user-9999")
    assert(stream == batch)
  }

  test("Tws crash-restore: RocksDB changelog checkpoint restores queue, write-pos and revision exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the 100 TB failover path StreamProcessorTws claims: incremental
    // changelog restore instead of full-snapshot reload
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    try {
      val cp = tmp("cp-tws-crash")
      val input = MemoryStream[InputEvent]
      val delivered = scala.collection.mutable.ArrayBuffer.empty[ProcessedSpan[String]]
      def start() = StreamProcessorTws.process[String](
          input.toDS(),
          (_, evs) => evs.map(e =>
            s"${e.index}${if (e.isUnfold) "u" else ""}:${e.data}").mkString("|"),
          requireAll = true)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[ProcessedSpan[String]],
                         _: Long) =>
          val rows = batch.collect()
          delivered.synchronized { delivered ++= rows }
          ()
        }
        .start()

      // phase 1: a completes a span; b buffers a gapped event (queue
      // state); c handles events + snapshot (revision state)
      val q1 = start()
      input.addData(
        InputEvent("a", 0, "t", "a0", 1, isUnfold = false),
        InputEvent("a", 1, "t", "a1", 1, isUnfold = false),
        InputEvent("b", 2, "t", "b2", 1, isUnfold = false), // gap: 0,1 missing
        InputEvent("c", 0, "t", "c0", 1, isUnfold = false),
        InputEvent("c", 1, "snap", "v1", 1, isUnfold = true))
      q1.processAllAvailable()
      q1.stop() // crash after commit

      // phase 2: a NEW query restores from the checkpoint
      val q2 = start()
      input.addData(
        InputEvent("a", 0, "t", "a0", 1, isUnfold = false), // redelivery: swallow
        InputEvent("a", 1, "t", "a1", 1, isUnfold = false),
        InputEvent("a", 2, "t", "a2", 1, isUnfold = false), // new: dispatch
        InputEvent("b", 0, "t", "b0", 1, isUnfold = false), // fills the gap
        InputEvent("b", 1, "t", "b1", 1, isUnfold = false),
        InputEvent("c", 1, "snap", "v2", 1, isUnfold = true)) // snapshot refresh
      q2.processAllAvailable()
      q2.stop()

      val spans = delivered.synchronized { delivered.toList }
      val byStream = spans.groupBy(_.streamName)
        .view.mapValues(_.sortBy(_.fromIndex)).toMap
      // exactly-once: every span delivered once, redeliveries swallowed
      assert(spans.size == 5, spans.map(s =>
        (s.streamName, s.fromIndex, s.toIndex, s.result)).toString)
      // a: write position survived the crash — the phase-2 redelivery
      // of 0,1 produced nothing; only the new event dispatched
      assert(byStream("a").map(s => (s.fromIndex, s.toIndex, s.result)) ==
        List((0L, 1L, "0:a0|1:a1"), (2L, 2L, "2:a2")))
      // b: the buffered gapped event survived — the gap fill dispatched
      // ONE contiguous span 0..2 (state loss would emit 0..1 only)
      assert(byStream("b").map(s => (s.fromIndex, s.toIndex, s.nEvents, s.result)) ==
        List((0L, 2L, 3, "0:b0|1:b1|2:b2")))
      // c: the unfold revision counter survived — the snapshot refresh
      // at the unchanged write position re-dispatched with a strictly
      // later revision (a reset counter could not order after r1)
      val List(c1, c2) = byStream("c").toList
      assert((c1.fromIndex, c1.toIndex, c1.handledUnfolds) == (0L, 1L, 1))
      assert((c2.fromIndex, c2.toIndex, c2.handledUnfolds, c2.result) ==
        (1L, 1L, 1, "1u:v2"))
      assert(c2.revision > c1.revision, s"r1=${c1.revision} r2=${c2.revision}")
    } finally {
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState engine is span-identical to flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[InputEvent]
      val out = StreamProcessorTws.process[String](
        input.toDS(),
        (_, evs) => evs.map(e => s"${e.index}:${e.eventType}").mkString("|"))
      val q = out.writeStream.format("memory").queryName("tws_out")
        .outputMode("append").option("checkpointLocation", tmp("cp-tws")).start()
      input.addData(
        InputEvent("a", 0, "t0", "", 1, isUnfold = false),
        InputEvent("a", 1, "t1", "", 1, isUnfold = false),
        InputEvent("b", 0, "x0", "", 1, isUnfold = false))
      q.processAllAvailable()
      // redelivery dedupe + continuation across micro-batches
      input.addData(
        InputEvent("a", 1, "t1", "", 1, isUnfold = false),
        InputEvent("a", 2, "t2", "", 1, isUnfold = false),
        InputEvent("b", 2, "x2", "", 1, isUnfold = false)) // gap: b missing 1
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("tws_out").as[ProcessedSpan[String]].collect()
        .groupBy(_.streamName).view.mapValues(_.sortBy(_.fromIndex).toList).toMap
      assert(rows("a").map(r => (r.fromIndex, r.toIndex, r.result)) ==
        List((0L, 1L, "0:t0|1:t1"), (2L, 2L, "2:t2")))
      assert(rows("b").map(r => (r.fromIndex, r.toIndex)) == List((0L, 0L), (2L, 2L)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join equals the batch q16_stream_join pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()

    // two watermarked streams: purchases join clicks of the same user
    // within the preceding 30 minutes (the engine's attribution join)
    val pIn = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val cIn = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val p = pIn.toDS().toDF("p_id", "p_ts", "p_uid", "p_type")
      .where(col("p_type") === "purchase").withWatermark("p_ts", "1 minute")
    val c = cIn.toDS().toDF("c_id", "c_ts", "c_uid", "c_type")
      .where(col("c_type") === "click").withWatermark("c_ts", "1 minute")
    val joined = p.join(c,
      col("p_uid") === col("c_uid") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("p_uid").as("uid"), col("p_id"), col("c_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-ssj")).start()
    pIn.addData(events.toIndexedSeq)
    cIn.addData(events.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val eventsDf = events.toSeq.toDF("event_id", "ts", "user_id", "event_type")
    val pB = eventsDf.where(col("event_type") === "purchase")
      .select(col("user_id").as("uid"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val cB = eventsDf.where(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val batch = pB.join(cB,
      col("uid") === col("c_uid") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("uid"), col("p_id"), col("c_id"))
      .as[(Long, Long, Long)].collect().toSet
    val stream = spark.table("ssj_out").as[(Long, Long, Long)].collect().toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("StreamProcessor on real data reproduces the batch q17 stateful fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real envelope, delivered as a stream in two arbitrary chunks
    val envelope = Envelope.fromEvents(
      Envelope.readTable(spark, "/root/testdata/sf0.001", "events"))
      .select(col("stream_name").as("streamName"), col("idx").as("index"),
        col("event_type").as("eventType"),
        format_number(col("value"), 4).as("data"), // exact decimal string
        col("size").cast("long").as("size"), lit(false).as("isUnfold"))
      .as[InputEvent].collect().sortBy(e => (e.index, e.streamName))

    val input = MemoryStream[InputEvent]
    val out = StreamProcessor.process[String](
      input.toDS(),
      // handler: per-span purchase-spend sum in exact cents
      (_, evs) => evs.filter(_.eventType == "purchase")
        .map(e => BigDecimal(e.data.replace(",", "")) * 100).sum.toLong.toString)
    val q = out.writeStream.format("memory").queryName("q17_stream")
      .outputMode("append").option("checkpointLocation", tmp("cp-q17")).start()
    val (chunk1, chunk2) = envelope.splitAt(envelope.length / 2)
    input.addData(chunk1.toIndexedSeq); q.processAllAvailable()
    input.addData(chunk2.toIndexedSeq); q.processAllAvailable()
    q.stop()

    // streaming totals per stream == batch q17 final running_spend
    val streamed = spark.table("q17_stream").as[ProcessedSpan[String]].collect()
      .groupBy(_.streamName).view
      .mapValues(_.map(r => BigDecimal(r.result.toLong) / 100).sum).toMap
    val batch = graft.operators.EventTimeQueries.q17Stateful
      .build(spark, "/root/testdata/sf0.001")
      .groupBy(col("stream_name"))
      .agg(max(col("running_spend")).as("final_spend"))
      .as[(String, Double)].collect().toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (s, v) =>
      assert((v - BigDecimal(batch(s))).abs < BigDecimal(0.005), s)
    }
  }

  test("DedupStream: incremental first-seen dedup equals the batch exact-dedup keep set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real corpus in batch 1; batch 2 redelivers it all, shifted-id
    // style (the q18_dedup_exact withDupes shape), so every batch-2
    // row must hit existing state and emit nothing
    val originals = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => DocIn(id, t) }
    val redelivered = originals.filter(_.docId % 10 == 0)
      .map(d => DocIn(d.docId + 1000000L, d.text))

    val input = MemoryStream[DocIn]
    val q = DedupStream.firstSeen(input.toDS())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").option("checkpointLocation", tmp("cp-dedup")).start()
    input.addData(originals.toIndexedSeq); q.processAllAvailable()
    val afterBatch1 = spark.table("dedup_stream").count()
    input.addData(redelivered.toIndexedSeq); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("dedup_stream").as[KeptDoc].collect()
      .map(k => (k.contentHash, k.docId)).toSet
    // batch oracle over the SAME delivered union: min doc_id per hash
    // (batch-1 originals always precede the +1e6 redeliveries, so
    // first-seen == global min)
    val batch = (originals ++ redelivered).toSeq.toDS()
      .groupBy(md5(col("text").cast("binary")).as("contentHash"))
      .agg(min(col("docId")).as("docId"))
      .as[(String, Long)].collect().toSet
    assert(streamed == batch)
    // batch 2 admitted nothing: every hash was already in state
    assert(afterBatch1 == streamed.size.toLong)
  }

  test("NearDupStream: LSH bucket index drops near-dups across batches, idempotent redo") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("nd-index"); val keptDir = tmp("nd-kept")
    val quarDir = tmp("nd-quar")
    val originals = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.start(input.toDS().toDF("doc_id", "text"),
      tmp("cp-neardup"), indexDir, keptDir, Some(quarDir))
    input.addData(originals.toIndexedSeq); q.processAllAvailable()
    val keptBatch1 = spark.read.parquet(keptDir).count()
    // batch 2: exact copies under new ids — identical shingles, same
    // buckets, every doc must collide with the index
    input.addData(originals.toIndexedSeq.map { case (id, t) => (id + 1000000L, t) })
    q.processAllAvailable()
    val keptBatch2 = spark.read.parquet(s"$keptDir/batch=1").count()
    q.stop()
    assert(keptBatch1 > 0)
    assert(keptBatch2 == 0, s"near-dup copies admitted: $keptBatch2")

    // within batch 1, bucket-min survives: every kept doc is the min of
    // each of its buckets; every dropped doc collided somewhere
    val kept1 = spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet
    val bands1 = graft.operators.SimilarityQueries.bandBuckets(
      originals.toSeq.toDF("doc_id", "text"))
    val minPerBucket = bands1.groupBy(col("band"), col("bucket"))
      .agg(min(col("doc_id")).as("min_id"))
    val shouldDrop = bands1.join(minPerBucket, Seq("band", "bucket"))
      .where(col("doc_id") > col("min_id")).select("doc_id")
      .as[Long].collect().toSet
    assert(kept1 == originals.map(_._1).toSet -- shouldDrop)

    // quarantine accounts for every gated doc: nothing is silently
    // destroyed. Batch 1 drops are in-batch bucket ties; batch 2
    // drops all collided with the persisted corpus index.
    val quar0 = spark.read.parquet(s"$quarDir/batch=0")
      .select(col("doc_id"), col("reason")).as[(Long, String)].collect()
    assert(quar0.map(_._1).toSet == shouldDrop)
    assert(quar0.forall(_._2 == "batch_min"))
    val quar1 = spark.read.parquet(s"$quarDir/batch=1")
      .select(col("doc_id"), col("reason")).as[(Long, String)].collect()
    assert(quar1.map(_._1).toSet == originals.map(_._1 + 1000000L).toSet)
    assert(quar1.forall(_._2 == "corpus_index"))

    // crash-redo probe: re-running a committed batch is a no-op, and a
    // batch whose marker is missing redoes idempotently (overwrite) —
    // the quarantine subdir included
    val batch1Df = originals.toSeq.toDF("doc_id", "text")
    NearDupStream.processBatch(batch1Df, 0L, indexDir, keptDir, Some(quarDir)) // marker exists
    assert(spark.read.parquet(s"$keptDir/batch=0").count() == kept1.size.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$indexDir/_batches/batch-0"))
    NearDupStream.processBatch(batch1Df, 0L, indexDir, keptDir, Some(quarDir)) // full redo
    assert(spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet == kept1)
    assert(spark.read.parquet(s"$quarDir/batch=0").select("doc_id")
      .as[Long].collect().toSet == shouldDrop)
  }

  test("EmbedDupStream: LSH hyperplane buckets drop duplicate vectors across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("em-index"); val keptDir = tmp("em-kept")
    val originals = Envelope.readTable(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect()

    val input = MemoryStream[(Long, Seq[Double])]
    val q = EmbedDupStream.start(input.toDS().toDF("doc_id", "embedding"),
      tmp("cp-emdup"), indexDir, keptDir)
    input.addData(originals.toIndexedSeq); q.processAllAvailable()
    val keptBatch1 = spark.read.parquet(s"$keptDir/batch=0").count()
    // batch 2: identical vectors under new ids — identical sign
    // pattern on every hyperplane, every bucket collides
    input.addData(originals.toIndexedSeq.map { case (id, v) => (id + 1000000L, v) })
    q.processAllAvailable()
    val keptBatch2 = spark.read.parquet(s"$keptDir/batch=1").count()
    q.stop()
    assert(keptBatch1 > 0)
    assert(keptBatch2 == 0, s"identical-vector copies admitted: $keptBatch2")
    // kept rows carry the embedding payload (the vector gate's
    // payload generalization)
    val cols = spark.read.parquet(s"$keptDir/batch=0").columns.toSet
    assert(cols == Set("doc_id", "embedding"), cols.toString)
  }

  test("SimhashDupStream: block-pair collisions drop near-dups across batches, bucket-min ties in-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("sh-index"); val keptDir = tmp("sh-kept")
    val originals = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = SimhashDupStream.start(input.toDS().toDF("doc_id", "text"),
      tmp("cp-shdup"), indexDir, keptDir)
    input.addData(originals.toIndexedSeq); q.processAllAvailable()
    // batch 2: identical texts under new ids — hamming 0, every
    // block-pair key collides with the index
    input.addData(originals.toIndexedSeq.map { case (id, t) => (id + 1000000L, t) })
    q.processAllAvailable()
    val keptBatch2 = spark.read.parquet(s"$keptDir/batch=1").count()
    q.stop()
    assert(keptBatch2 == 0, s"hamming-0 copies admitted: $keptBatch2")

    // within batch 1, bucket-min survives per the shared signature
    val kept1 = spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet
    val keys = graft.operators.SimilarityQueries.simhashBuckets(
      originals.toSeq.toDF("doc_id", "text"))
    val shouldDrop = keys
      .join(keys.groupBy(col("band"), col("bucket"))
        .agg(min(col("doc_id")).as("min_id")), Seq("band", "bucket"))
      .where(col("doc_id") > col("min_id")).select("doc_id")
      .as[Long].collect().toSet
    assert(kept1 == originals.map(_._1).toSet -- shouldDrop)
    assert(kept1.nonEmpty)
  }

  test("ExactDupStream: byte-equal texts drop across batches, distinct texts always pass") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("xd-index"); val keptDir = tmp("xd-kept")
    val input = MemoryStream[(Long, String)]
    val q = ExactDupStream.start(input.toDS().toDF("doc_id", "text"),
      tmp("cp-exactdup"), indexDir, keptDir)
    // batch 0: two byte-equal texts (in-batch tie → min doc_id wins)
    // plus distinct ones
    input.addData(Seq((1L, "alpha beta"), (2L, "gamma"), (7L, "alpha beta")))
    q.processAllAvailable()
    val kept0 = spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet
    assert(kept0 == Set(1L, 2L), s"in-batch exact tie resolves to min id: $kept0")
    // batch 1: one seen text (drops), one new (passes); near-identical
    // but not byte-equal text must NOT drop — exact means exact
    input.addData(Seq((10L, "gamma"), (11L, "alpha  beta"), (12L, "delta")))
    q.processAllAvailable()
    val kept1 = spark.read.parquet(s"$keptDir/batch=1").select("doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(kept1 == Set(11L, 12L),
      s"seen text drops, near-identical text passes exact gate: $kept1")
  }

  test("compactIndex folds completed batch partitions, preserves gate behavior and crash safety") {
    import spark.implicits._
    val indexDir = tmp("ci-index"); val keptDir = tmp("ci-kept")
    def docs(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
      rows.toSeq.toDF("doc_id", "text")
    ExactDupStream.processBatch(docs(1L -> "alpha", 2L -> "beta"), 0L, indexDir, keptDir)
    ExactDupStream.processBatch(docs(3L -> "gamma", 4L -> "alpha"), 1L, indexDir, keptDir)
    ExactDupStream.processBatch(docs(5L -> "delta"), 2L, indexDir, keptDir)
    val before = spark.read.parquet(indexDir)
      .select("band", "bucket").distinct().as[(Int, String)].collect().toSet

    assert(NearDupStream.compactIndex(spark, indexDir) == 3L)
    def dataDirs: Set[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(indexDir))
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("batch=")).toSet }
      finally s.close()
    }
    // one consolidated negative partition, markers retained
    assert(dataDirs == Set("batch=-1"), dataDirs.toString)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$indexDir/_batches/batch-2")))
    val after = spark.read.parquet(indexDir)
      .select("band", "bucket").distinct().as[(Int, String)].collect().toSet
    assert(after == before, "compaction changed the bucket set")
    // gate behavior unchanged: seen text drops, fresh passes
    ExactDupStream.processBatch(docs(6L -> "beta", 7L -> "epsilon"), 3L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=3").select("doc_id")
      .as[Long].collect().toSet == Set(7L))
    // re-compaction folds the new batch in; then nothing left to fold
    assert(NearDupStream.compactIndex(spark, indexDir) == 2L)
    assert(NearDupStream.compactIndex(spark, indexDir) == 0L)
    assert(dataDirs == Set("batch=-2"), dataDirs.toString)

    // crash sim: an index partition WITHOUT its marker (crash between
    // index write and marker) must never be folded — its redo owns it
    docs(8L -> "zeta").select(lit(0).as("band"), md5(col("text")).as("bucket"))
      .write.parquet(s"$indexDir/batch=9")
    assert(NearDupStream.compactIndex(spark, indexDir) == 0L)
    assert(dataDirs == Set("batch=-2", "batch=9"))
    // the redo overwrites the orphan (and must not see its own
    // half-written buckets: zeta is admitted, not self-dropped)
    ExactDupStream.processBatch(docs(8L -> "zeta"), 9L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=9").select("doc_id")
      .as[Long].collect().toSet == Set(8L))
    // now marked → foldable; the gate still remembers everything
    assert(NearDupStream.compactIndex(spark, indexDir) == 2L)
    ExactDupStream.processBatch(docs(9L -> "zeta", 10L -> "eta"), 10L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=10").select("doc_id")
      .as[Long].collect().toSet == Set(10L))
  }

  test("compactIndex crash debris converges: superset after mid-delete, subset after mid-write") {
    import spark.implicits._
    val indexDir = tmp("ci-crash-index"); val keptDir = tmp("ci-crash-kept")
    def docs(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
      rows.toSeq.toDF("doc_id", "text")
    ExactDupStream.processBatch(docs(1L -> "alpha", 2L -> "beta"), 0L, indexDir, keptDir)
    ExactDupStream.processBatch(docs(3L -> "gamma"), 1L, indexDir, keptDir)
    assert(NearDupStream.compactIndex(spark, indexDir) == 2L) // -> batch=-1
    ExactDupStream.processBatch(docs(4L -> "delta"), 2L, indexDir, keptDir)

    // (a) crash BETWEEN the consolidated write and the source deletes:
    // the fresh negative partition exists NEXT TO its intact sources —
    // a superset. The gate must behave identically (dup (band, bucket)
    // rows are harmless under the semi-join)...
    spark.read.parquet(s"$indexDir/batch=-1", s"$indexDir/batch=2")
      .select(col("band"), col("bucket")).distinct()
      .write.parquet(s"$indexDir/batch=-2")
    ExactDupStream.processBatch(docs(5L -> "alpha", 6L -> "epsilon"), 3L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=3").select("doc_id")
      .as[Long].collect().toSet == Set(6L), "superset debris changed gate behavior")
    // ...and the next compaction folds the debris (negatives are
    // always sources) into one partition
    assert(NearDupStream.compactIndex(spark, indexDir) == 4L) // -2, -1, 2, 3
    val dirs1 = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(indexDir))
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("batch=")).toSet }
      finally s.close()
    }
    assert(dirs1 == Set("batch=-3"), dirs1.toString)

    // (b) crash MID-consolidated-write: task-commit atomicity means
    // the dir holds whole part-files for a SUBSET of rows plus
    // _temporary junk and no _SUCCESS — readable (underscore paths are
    // filtered), duplicates-of-a-subset harmless, and the next
    // compaction folds it because a negative id is always a source
    spark.read.parquet(s"$indexDir/batch=-3").limit(1)
      .write.parquet(s"$indexDir/batch=-4")
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$indexDir/batch=-4/_SUCCESS"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$indexDir/batch=-4/_temporary/0"))
    ExactDupStream.processBatch(docs(7L -> "beta", 8L -> "zeta"), 4L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=4").select("doc_id")
      .as[Long].collect().toSet == Set(8L), "partial-subset debris changed gate behavior")
    assert(NearDupStream.compactIndex(spark, indexDir) == 3L) // -4, -3, 4
    // converged: everything ever admitted still gates
    ExactDupStream.processBatch(
      docs(9L -> "alpha", 10L -> "gamma", 11L -> "delta", 12L -> "epsilon",
        13L -> "zeta", 14L -> "theta"), 5L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=5").select("doc_id")
      .as[Long].collect().toSet == Set(14L), "post-convergence gate lost history")
  }

  test("WinnowDupStream: a shared >=8-word passage gates a doc; short docs pass; idempotent redo") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("win-index"); val keptDir = tmp("win-kept")
    val qDir = tmp("win-quar")
    val passage = (1 to 9).map(i => s"p$i").mkString(" ")
    val other = (1 to 12).map(i => s"o$i").mkString(" ")

    val input = MemoryStream[(Long, String)]
    val q = WinnowDupStream.start(input.toDS().toDF("doc_id", "text"),
      tmp("cp-windup"), indexDir, keptDir, Some(qDir))
    // batch 0: doc 3 embeds doc 1's 9-word passage → in-batch
    // fingerprint tie, min doc_id survives; doc 2 is disjoint
    input.addData(Seq((1L, s"$passage alpha beta gamma delta"),
      (2L, other), (3L, s"intro words here $passage tail words")))
    q.processAllAvailable()
    val kept0 = spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet
    assert(kept0 == Set(1L, 2L), s"passage-sharing doc must gate in-batch: $kept0")
    // batch 1: doc 10 re-ships doc 2's text (corpus-index hit), doc 11
    // is fresh, doc 12 is sub-window (4 words → no fingerprints → passes)
    input.addData(Seq((10L, s"prefix $other suffix"),
      (11L, (1 to 12).map(i => s"n$i").mkString(" ")),
      (12L, "too short to window")))
    q.processAllAvailable()
    val kept1 = spark.read.parquet(s"$keptDir/batch=1").select("doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(kept1 == Set(11L, 12L), s"corpus passage hit gates, short doc passes: $kept1")
    // quarantine records the reason per drop
    val quar = spark.read.parquet(qDir).select("doc_id", "reason")
      .as[(Long, String)].collect().toMap
    assert(quar == Map(3L -> "batch_min", 10L -> "corpus_index"))

    // crash-redo probe: committed batch no-ops; marker-less batch
    // redoes idempotently against the same index state
    val batch1Df = Seq((10L, s"prefix $other suffix"),
      (11L, (1 to 12).map(i => s"n$i").mkString(" ")),
      (12L, "too short to window")).toDF("doc_id", "text")
    WinnowDupStream.processBatch(batch1Df, 1L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=1").select("doc_id")
      .as[Long].collect().toSet == kept1)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$indexDir/_batches/batch-1"))
    WinnowDupStream.processBatch(batch1Df, 1L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=1").select("doc_id")
      .as[Long].collect().toSet == kept1)
  }

  test("ImageDupStream: decoded-bucket index drops image near-dups across batches, idempotent redo") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("img-index"); val keptDir = tmp("img-kept")
    val originals = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = ImageDupStream.start(input.toDS().toDF("doc_id", "text"),
      tmp("cp-imgdup"), indexDir, keptDir)
    input.addData(originals.toIndexedSeq); q.processAllAvailable()
    val keptBatch1 = spark.read.parquet(keptDir).count()
    // batch 2: identical bytes under new ids — identical decoded
    // signatures, every asset must collide with the index
    input.addData(originals.toIndexedSeq.map { case (id, t) => (id + 1000000L, t) })
    q.processAllAvailable()
    val keptBatch2 = spark.read.parquet(s"$keptDir/batch=1").count()
    q.stop()
    assert(keptBatch1 > 0)
    assert(keptBatch2 == 0, s"identical-signature images admitted: $keptBatch2")

    // within batch 1, bucket-min survives — recompute the expected
    // keep set from the BATCH operator's shared signature frame
    val kept1 = spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet
    val feats = graft.operators.TextQueries.imageFeatures(
      originals.toSeq.toDF("doc_id", "text")
        .select(col("doc_id").as("asset_id"), lit("img").as("kind"),
          col("text").cast("binary").as("bytes")))
    val shouldDrop = feats
      .join(feats.groupBy(col("bkt")).agg(min(col("asset_id")).as("min_id")), Seq("bkt"))
      .where(col("asset_id") > col("min_id")).select("asset_id")
      .as[Long].collect().toSet
    assert(kept1 == originals.map(_._1).toSet -- shouldDrop)
    // the fixture must actually exercise the drop path
    assert(shouldDrop.nonEmpty && kept1.nonEmpty)

    // crash-redo probe: committed batch no-ops; marker-less batch
    // redoes idempotently
    val batch1Df = originals.toSeq.toDF("doc_id", "text")
    ImageDupStream.processBatch(batch1Df, 0L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=0").count() == kept1.size.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$indexDir/_batches/batch-0"))
    ImageDupStream.processBatch(batch1Df, 0L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet == kept1)
  }

  test("AudioDupStream: decoded-bucket index drops audio near-dups across batches, idempotent redo") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("wav-index"); val keptDir = tmp("wav-kept")
    val quarDir = tmp("wav-quar")
    val originals = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = AudioDupStream.start(input.toDS().toDF("doc_id", "text"),
      tmp("cp-wavdup"), indexDir, keptDir, Some(quarDir))
    input.addData(originals.toIndexedSeq); q.processAllAvailable()
    val keptBatch1 = spark.read.parquet(keptDir).count()
    // batch 2: identical bytes under new ids — identical decoded
    // signatures, every asset must collide with the index
    input.addData(originals.toIndexedSeq.map { case (id, t) => (id + 1000000L, t) })
    q.processAllAvailable()
    val keptBatch2 = spark.read.parquet(s"$keptDir/batch=1").count()
    q.stop()
    assert(keptBatch1 > 0)
    assert(keptBatch2 == 0, s"identical-signature audio admitted: $keptBatch2")

    // within batch 1, bucket-min survives — recompute the expected
    // keep set from the BATCH operator's shared signature frame
    val kept1 = spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet
    val feats = graft.operators.TextQueries.audioFeatures(
      originals.toSeq.toDF("doc_id", "text")
        .select(col("doc_id").as("asset_id"), lit("wav").as("kind"),
          col("text").cast("binary").as("bytes")))
    val shouldDrop = feats
      .join(feats.groupBy(col("bkt")).agg(min(col("asset_id")).as("min_id")), Seq("bkt"))
      .where(col("asset_id") > col("min_id")).select("asset_id")
      .as[Long].collect().toSet
    assert(kept1 == originals.map(_._1).toSet -- shouldDrop)
    // the fixture must actually exercise the drop path
    assert(shouldDrop.nonEmpty && kept1.nonEmpty)

    // the gate is lossy (no gain-delta confirm) but not destructive:
    // the quarantine holds exactly the gated assets with their drop
    // reason, so the batch resolver can re-run the exact confirm on
    // (quarantined × kept) within a bucket and re-admit pairs the
    // confirm rejects — nothing the stream drops is unrecoverable
    val quar0 = spark.read.parquet(s"$quarDir/batch=0")
      .select(col("doc_id"), col("reason")).as[(Long, String)].collect()
    assert(quar0.map(_._1).toSet == shouldDrop)
    assert(quar0.forall(_._2 == "batch_min"))

    // crash-redo probe: committed batch no-ops; marker-less batch
    // redoes idempotently
    val batch1Df = originals.toSeq.toDF("doc_id", "text")
    AudioDupStream.processBatch(batch1Df, 0L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=0").count() == kept1.size.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$indexDir/_batches/batch-0"))
    AudioDupStream.processBatch(batch1Df, 0L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet == kept1)
  }

  test("VideoDupStream: demuxed-bucket index drops video near-dups across batches, idempotent redo") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = tmp("vid-index"); val keptDir = tmp("vid-kept")
    val quarDir = tmp("vid-quar")
    val originals = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = VideoDupStream.start(input.toDS().toDF("doc_id", "text"),
      tmp("cp-viddup"), indexDir, keptDir, Some(quarDir))
    input.addData(originals.toIndexedSeq); q.processAllAvailable()
    val keptBatch1 = spark.read.parquet(keptDir).count()
    // batch 2: identical bytes under new ids — identical demuxed
    // signatures, every asset must collide with the index
    input.addData(originals.toIndexedSeq.map { case (id, t) => (id + 1000000L, t) })
    q.processAllAvailable()
    val keptBatch2 = spark.read.parquet(s"$keptDir/batch=1").count()
    q.stop()
    assert(keptBatch1 > 0)
    assert(keptBatch2 == 0, s"identical-signature videos admitted: $keptBatch2")

    // within batch 1, bucket-min survives — recompute the expected
    // keep set from the BATCH operator's shared signature frame
    val kept1 = spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet
    val feats = graft.operators.TextQueries.videoFeatures(
      originals.toSeq.toDF("doc_id", "text")
        .select(col("doc_id").as("asset_id"), lit("gif").as("kind"),
          col("text").cast("binary").as("bytes")))
    val shouldDrop = feats
      .join(feats.groupBy(col("bkt")).agg(min(col("asset_id")).as("min_id")), Seq("bkt"))
      .where(col("asset_id") > col("min_id")).select("asset_id")
      .as[Long].collect().toSet
    assert(kept1 == originals.map(_._1).toSet -- shouldDrop)
    // the fixture must actually exercise the drop path
    assert(shouldDrop.nonEmpty && kept1.nonEmpty)

    // the gate is lossy (no two-frame L1 confirm) but not destructive:
    // quarantine holds exactly the gated assets with their drop reason
    // so batch q18_video_dedup can re-run the exact confirm and
    // re-admit pairs it rejects — nothing the stream drops is lost
    val quar0 = spark.read.parquet(s"$quarDir/batch=0")
      .select(col("doc_id"), col("reason")).as[(Long, String)].collect()
    assert(quar0.map(_._1).toSet == shouldDrop)
    assert(quar0.forall(_._2 == "batch_min"))

    // crash-redo probe: committed batch no-ops; marker-less batch
    // redoes idempotently
    val batch1Df = originals.toSeq.toDF("doc_id", "text")
    VideoDupStream.processBatch(batch1Df, 0L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=0").count() == kept1.size.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$indexDir/_batches/batch-0"))
    VideoDupStream.processBatch(batch1Df, 0L, indexDir, keptDir)
    assert(spark.read.parquet(s"$keptDir/batch=0").select("doc_id")
      .as[Long].collect().toSet == kept1)
  }

  test("StreamProcessor requireAll holds gapped streams until the gap fills") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[InputEvent]
    val out = StreamProcessor.process[String](
      input.toDS(), (_, evs) => evs.map(_.index).mkString(","),
      requireAll = true)
    val q = out.writeStream.format("memory").queryName("reqall_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-reqall")).start()
    // batch 1: gapped delivery (2,3 without 0,1) → must be held
    input.addData(
      InputEvent("g", 2, "t", "", 1, isUnfold = false),
      InputEvent("g", 3, "t", "", 1, isUnfold = false))
    q.processAllAvailable()
    assert(spark.table("reqall_out").isEmpty)
    // batch 2: the gap fills → everything dispatches in order
    input.addData(
      InputEvent("g", 0, "t", "", 1, isUnfold = false),
      InputEvent("g", 1, "t", "", 1, isUnfold = false))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("reqall_out").as[ProcessedSpan[String]].collect()
    assert(rows.map(r => (r.fromIndex, r.toIndex, r.result)).toList ==
      List((0L, 3L, "0,1,2,3")))
  }

  test("JsonLinesSource: tranche-partitioned delivery, exactly-once resume after restart") {
    import spark.implicits._
    val file = Files.createTempFile("feed", ".ndjson")
    Files.writeString(file, (0 until 20).map(i => s"""{"n":$i}""").mkString("\n") + "\n")
    val cp = tmp("cp-jsonl")
    val outDir = tmp("jsonl-out")

    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.JsonLinesSource")
        .option("path", file.toString).option("numTranches", "4")
        .option("maxLinesPerTrigger", "3")
        .load()
        .select(col("tranche"), col("line_no"),
          get_json_object(col("value"), "$.n").cast("long").as("n"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val first = spark.read.parquet(outDir).as[(Int, Long, Long)].collect()
    assert(first.map(_._3).sorted.toList == (0L until 20L).toList) // all, once
    assert(first.map(_._1).distinct.sorted.toList == List(0, 1, 2, 3)) // 4 tranches

    // append 8 more lines; a restarted query must deliver only those
    Files.writeString(file,
      (20 until 28).map(i => s"""{"n":$i}""").mkString("\n") + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    run()
    val second = spark.read.parquet(outDir).as[(Int, Long, Long)].collect()
    assert(second.map(_._3).sorted.toList == (0L until 28L).toList)
  }

  test("StreamProcessor state survives a query restart: write-pos dedupes redeliveries") {
    import spark.implicits._
    val file = Files.createTempFile("feed-state", ".ndjson")
    def line(s: String, i: Long) = s"""{"s":"$s","i":$i}"""
    // run 1: stream a gets [0..2], stream b gets [0..1]
    Files.writeString(file,
      (Seq(line("a", 0), line("a", 1), line("a", 2), line("b", 0), line("b", 1))
        .mkString("\n")) + "\n")
    val cp = tmp("cp-state-resume")
    val outDir = tmp("state-resume-out")

    def run(): Unit = {
      val parsed = spark.readStream.format("graft.sources.JsonLinesSource")
        .option("path", file.toString).option("numTranches", "1")
        .load()
        .select(
          get_json_object(col("value"), "$.s").as("streamName"),
          get_json_object(col("value"), "$.i").cast("long").as("index"),
          lit("t").as("eventType"), lit("").as("data"),
          lit(1L).as("size"), lit(false).as("isUnfold"))
        .as[InputEvent]
      val q = StreamProcessor.process[Int](parsed, (_, evs) => evs.size)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()

    // run 2 (fresh query instance, same checkpoint): REDELIVER a's 1-2
    // plus new a:3, b:2 — the recovered per-stream write position must
    // drop the redeliveries, so only [3..3] and [2..2] dispatch
    Files.writeString(file,
      (Seq(line("a", 1), line("a", 2), line("a", 3), line("b", 2))
        .mkString("\n")) + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    run()

    val spans = spark.read.parquet(outDir)
      .select("streamName", "fromIndex", "toIndex")
      .as[(String, Long, Long)].collect().sorted.toList
    assert(spans == List(("a", 0L, 2L), ("a", 3L, 3L), ("b", 0L, 1L), ("b", 2L, 2L)))
  }

  test("IndexHydrate: IndexOnly synthesizes the envelope without touching the store") {
    import spark.implicits._
    val envelope = Envelope.fromEvents(
      Envelope.readTable(spark, "/root/testdata/sf0.001", "events"))
      .select(col("stream_name"), col("idx"), col("event_type"))
    val index = graft.sources.IndexHydrate.buildIndex(envelope)
    // contiguous per-stream envelope → one island per stream
    assert(index.count() == envelope.select("stream_name").distinct().count())
    val synthesized = graft.sources.IndexHydrate.readIndexOnly(index)
      .as[(String, Long, String)].collect().toSet
    val expected = envelope.as[(String, Long, String)].collect().toSet
    assert(synthesized == expected)
  }

  test("AppendSink: outcome lattice and idempotent re-delivery") {
    import spark.implicits._
    val target = tmp("sink-target") + "/store"
    val batch1 = Seq(("s-1", 0L, "e"), ("s-1", 1L, "e"), ("s-2", 0L, "e"))
      .toDF("stream_name", "idx", "payload")
    val out1 = AppendSink.appendIdempotent(spark, target, batch1)
      .as[(String, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out1.map(r => (r._1, r._5)).toList == List(("s-1", "Ok"), ("s-2", "Ok")))

    // redelivery + partial overlap + gap
    val batch2 = Seq(
      ("s-1", 1L, "e"), ("s-1", 2L, "e"), // partial duplicate → trim to idx 2
      ("s-2", 0L, "e"), // full duplicate
      ("s-3", 5L, "e")) // prefix missing (gap)
      .toDF("stream_name", "idx", "payload")
    val out2 = AppendSink.appendIdempotent(spark, target, batch2)
      .as[(String, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out2.map(r => (r._1, r._5)).toList ==
      List(("s-1", "PartialDuplicate"), ("s-2", "Duplicate"), ("s-3", "PrefixMissing")))

    val stored = spark.read.parquet(target).as[(String, Long, String)].collect()
      .map(r => (r._1, r._2)).sorted.toList
    assert(stored == List(("s-1", 0L), ("s-1", 1L), ("s-1", 2L), ("s-2", 0L)))

    // pruning: drop s-1 up to idx 1
    val pruneStats = AppendSink.prune(spark, target, Map("s-1" -> 1L))
      .as[(String, Long, Long)].collect().sortBy(_._1).toList
    assert(pruneStats == List(("s-1", 2L, 1L), ("s-2", 0L, 1L)))
    val after = spark.read.parquet(target).as[(String, Long, String)].collect()
      .map(r => (r._1, r._2)).sorted.toList
    assert(after == List(("s-1", 2L), ("s-2", 0L)))
  }

  test("AppendSink: gapped islands classify per island, gap never persisted") {
    import spark.implicits._
    val target = tmp("sink-islands") + "/store"
    // one batch carrying islands [0..1] and [3..3] of the same stream:
    // the contiguous prefix appends, the gapped island is held
    val batch1 = Seq(("s-9", 0L, "e"), ("s-9", 1L, "e"), ("s-9", 3L, "e"))
      .toDF("stream_name", "idx", "payload")
    val out1 = AppendSink.appendIdempotent(spark, target, batch1)
      .as[(String, Long, Long, Long, String)].collect().sortBy(_._2)
    assert(out1.map(r => (r._2, r._3, r._5)).toList ==
      List((0L, 2L, "Ok"), (3L, 4L, "PrefixMissing")))
    assert(spark.read.parquet(target).agg(max(col("idx"))).as[Long].head() == 1L)

    // the late middle event arrives: it is NOT a duplicate (no gap was
    // persisted), and the redelivered island [3..3] now also lands
    val batch2 = Seq(("s-9", 2L, "e"), ("s-9", 3L, "e"))
      .toDF("stream_name", "idx", "payload")
    val out2 = AppendSink.appendIdempotent(spark, target, batch2)
      .as[(String, Long, Long, Long, String)].collect().sortBy(_._2)
    assert(out2.map(_._5).toList == List("Ok"))
    assert(out2.head._2 == 2L && out2.head._3 == 4L)
    val stored = spark.read.parquet(target).select("idx").as[Long]
      .collect().sorted.toList
    assert(stored == List(0L, 1L, 2L, 3L))
  }

  test("StreamProcessor: only the freshest unfold set reaches the handler") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[InputEvent]
    val out = StreamProcessor.process[String](
      input.toDS(),
      (_, evs) => evs.map(e =>
        s"${if (e.isUnfold) "u" else "e"}${e.index}:${e.eventType}").mkString("|"))
    val q = out.writeStream.format("memory").queryName("unfold_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-unfold")).start()
    // two unfold generations delivered together: only idx-3's set survives
    input.addData(
      InputEvent("u-1", 0, "t", "", 1, isUnfold = false),
      InputEvent("u-1", 1, "t", "", 1, isUnfold = false),
      InputEvent("u-1", 2, "snap", "", 1, isUnfold = true),
      InputEvent("u-1", 2, "t", "", 1, isUnfold = false),
      InputEvent("u-1", 3, "snap", "", 1, isUnfold = true),
      InputEvent("u-1", 3, "other", "", 1, isUnfold = true))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("unfold_out").as[ProcessedSpan[String]].collect()
    assert(rows.length == 1)
    assert(rows.head.result == "e0:t|e1:t|e2:t|u3:snap|u3:other")
  }

  test("malformed quarantine: a-bad poisons on failure, a-ok unaffected, watchdog abends") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[InputEvent]
    val out = StreamProcessor.process[String](
      input.toDS(),
      (s, evs) =>
        if (s == "a-bad") throw new RuntimeException("transient")
        else s"ok:${evs.size}")
    val q = out.writeStream.format("memory").queryName("health_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-health")).start()
    input.addData(
      InputEvent("a-ok", 0, "t", "", 1, isUnfold = false),
      InputEvent("a-ok", 1, "t", "", 1, isUnfold = false),
      InputEvent("a-bad", 0, "t", "", 1, isUnfold = false))
    q.processAllAvailable()
    // later batch: quarantined stream dispatches nothing more; a-ok continues
    input.addData(
      InputEvent("a-bad", 1, "t", "", 1, isUnfold = false),
      InputEvent("a-ok", 2, "t", "", 1, isUnfold = false))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("health_out").as[ProcessedSpan[String]].collect()
    val bad = rows.filter(_.streamName == "a-bad")
    assert(bad.length == 1 && bad.head.failed && bad.head.error == "transient")
    assert(rows.filter(_.streamName == "a-ok").map(_.result).sorted.toList ==
      List("ok:1", "ok:2")) // [0,1] then [2]

    // dead-letter rows feed the watchdog (reference SinkHealthTests path)
    var now = 10000L
    val mon = new Observability.BusyMonitor(() => now)
    rows.foreach(r =>
      if (r.failed) mon.recordFailure(r.streamName) else mon.recordSuccess(r.streamName))
    mon.recordNoProgress("a-stuck") // third fixture stream: alive, no progress
    now += 60000L
    val ex = intercept[Observability.HealthCheckException](mon.healthCheck(30000L))
    assert(ex.failingStreams.map(_._1) == Seq("a-bad"))
    assert(ex.stuckStreams.map(_._1) == Seq("a-stuck"))
  }

  test("CheckpointStore: latest-wins commit and read-back") {
    val dir = tmp("cp-store") + "/checkpoints"
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 42L)
    CheckpointStore.commit(spark, dir, "feed", "1", "g1", 7L)
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 99L) // overwrite
    assert(CheckpointStore.position(spark, dir, "feed", "0", "g1").contains(99L))
    assert(CheckpointStore.position(spark, dir, "feed", "1", "g1").contains(7L))
    assert(CheckpointStore.position(spark, dir, "feed", "2", "g1").isEmpty)
  }

  test("PointerFile reads to EOF across buffer boundaries, never a pre-stat'd length") {
    // the defect class: stat-then-readFully truncates if a concurrent
    // atomic swap grows the byte count between stat and open (v=9 →
    // v=10 parsed as "1", naming a GC'd version); the EOF loop reads
    // whatever the open() resolved, complete — pinned here across
    // multiple internal buffer fills
    val dir = tmp("ptr-eof")
    val p = new org.apache.hadoop.fs.Path(dir, "_current")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val content = "9" * 1000 // > the reader's 256-byte buffer
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    assert(PointerFile.readString(fs, p).contains(content))
    assert(PointerFile.readString(fs, new org.apache.hadoop.fs.Path(dir, "absent")).isEmpty)
  }

  test("CheckpointStore: crash-leftover junk never loses or corrupts positions") {
    import java.nio.file.{Files, Paths}
    val dir = tmp("cp-crash") + "/checkpoints"
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 11L)
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 22L)
    // simulate a SIGKILL mid-commit: a half-written next version (no
    // _current move) and an orphaned pointer temp file
    Files.createDirectories(Paths.get(dir, "v=99"))
    Files.write(Paths.get(dir, "v=99", "part-junk"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(dir, "_current.tmp99"), "99".getBytes("UTF-8"))
    assert(CheckpointStore.position(spark, dir, "feed", "0", "g1").contains(22L))
    // the next commit still works and GC clears the junk
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 33L)
    assert(CheckpointStore.position(spark, dir, "feed", "0", "g1").contains(33L))
    assert(!Files.exists(Paths.get(dir, "_current.tmp99")))
  }

  test("CheckpointStore: GC retains exactly {current, current-1}") {
    import java.nio.file.{Files, Paths}
    val dir = tmp("cp-gc") + "/checkpoints"
    def versions: Seq[Long] = {
      val it = Files.list(Paths.get(dir)).iterator()
      val b = List.newBuilder[Long]
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("v=")) b += n.drop(2).takeWhile(_ != '-').toLong
      }
      b.result().sorted
    }
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 1L) // v=1
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 2L) // v=2
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 3L) // v=3
    // current-1 must survive the swap: a reader that resolved it just
    // before the pointer move may still be scanning it (ADVICE r13)
    assert(versions == Seq(2L, 3L), s"retained $versions")
    // crash-leftover versions ABOVE current are junk (their pointer
    // move never happened); a FRESH one is indistinguishable from a
    // racing committer's in-flight dir, so the sweep age-gates it —
    // only an hour-old orphan is collected
    val junk = Paths.get(dir, "v=77-deadbeef")
    Files.createDirectories(junk)
    Files.write(junk.resolve("part-junk"), Array[Byte](9))
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 4L) // v=4
    assert(versions == Seq(3L, 4L, 77L), s"fresh above-current junk must survive: $versions")
    Files.setLastModifiedTime(junk,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200_000L))
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 5L) // v=5
    assert(versions == Seq(4L, 5L), s"aged orphan must be collected: $versions")
  }

  test("CheckpointStore: two interleaved committers — one loses cleanly, versions never mix") {
    import java.nio.file.{Files, Paths}
    val dir = tmp("cp-fence") + "/checkpoints"
    CheckpointStore.commit(spark, dir, "feed", "0", "g1", 10L)
    // committer A snapshots the pointer and writes its data dir; the
    // test seam then lands a FULL commit B in A's write→publish window;
    // A's publish CAS must detect the moved pointer and lose cleanly
    CheckpointStore.beforePublish = () => {
      CheckpointStore.beforePublish = () => ()
      CheckpointStore.commit(spark, dir, "feed", "9", "gB", 77L) // B wins
    }
    val err = intercept[java.util.ConcurrentModificationException] {
      CheckpointStore.commit(spark, dir, "feed", "1", "gA", 55L)
    }
    assert(err.getMessage.contains("fenced off"))
    // the store holds B's update and the base row; A's row is absent
    // (A re-reads and reapplies — the lost-update rule of a CAS loser)
    val rows = CheckpointStore.read(spark, dir).toSet
    assert(rows == Set(("feed", "0", "g1", 10L), ("feed", "9", "gB", 77L)), rows.toString)
    // no mixed dir: every retained version dir is a single complete
    // commit (exactly one _SUCCESS, one part file set from one job)
    val it = Files.list(Paths.get(dir)).iterator()
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (n.startsWith("v=")) {
        val parts = Files.list(p).iterator()
        val uuids = collection.mutable.Set.empty[String]
        while (parts.hasNext) {
          val f = parts.next().getFileName.toString
          if (f.startsWith("part-")) uuids += f.split("-", 3)(2)
        }
        assert(uuids.size <= 1, s"$n mixes part files from two jobs: $uuids")
      }
    }
    // A's retry (a fresh read-modify-write) lands normally
    CheckpointStore.commit(spark, dir, "feed", "1", "gA", 55L)
    assert(CheckpointStore.position(spark, dir, "feed", "1", "gA").contains(55L))
    assert(CheckpointStore.position(spark, dir, "feed", "9", "gB").contains(77L))
  }

  test("CheckpointStore: legacy flat files are absorbed then removed on first versioned commit") {
    import java.nio.file.{Files, Paths}
    val dir = tmp("cp-legacy-absorb") + "/checkpoints"
    // write a legacy (pre-versioned) flat-layout store at the dir root
    import spark.implicits._
    List(("feed", "0", "g1", 41L)).toDF("source", "tranche", "group", "pos")
      .coalesce(1).write.parquet(dir)
    assert(CheckpointStore.position(spark, dir, "feed", "0", "g1").contains(41L))
    // first versioned commit absorbs the legacy rows into v=1 ...
    CheckpointStore.commit(spark, dir, "feed", "1", "g1", 7L)
    assert(CheckpointStore.position(spark, dir, "feed", "0", "g1").contains(41L))
    assert(CheckpointStore.position(spark, dir, "feed", "1", "g1").contains(7L))
    // ... and removes the root data files, so a later lost pointer
    // surfaces as "empty" instead of silently serving stale positions
    val legacyLeft = Files.list(Paths.get(dir)).iterator()
    val names = { val b = List.newBuilder[String]
      while (legacyLeft.hasNext) b += legacyLeft.next().getFileName.toString; b.result() }
    // (dot-files are the local ChecksumFileSystem's crc sidecars for
    // the pointer itself — not legacy data; read() ignores them too)
    assert(names.forall(n => n == "_current" || n.startsWith("v=") || n.startsWith(".")),
      names.toString)
    Files.delete(Paths.get(dir, "_current"))
    assert(CheckpointStore.read(spark, dir).isEmpty)
  }

  test("CheckpointStore: legacy flat dir with no data files reads as empty") {
    import java.nio.file.{Files, Paths}
    val dir = tmp("cp-legacy") + "/checkpoints"
    // the state the old overwrite-in-place commit left after a kill:
    // dir exists, only a _temporary job dir inside — must read as
    // empty, not throw UNABLE_TO_INFER_SCHEMA
    Files.createDirectories(Paths.get(dir, "_temporary"))
    assert(CheckpointStore.read(spark, dir).isEmpty)
    assert(CheckpointStore.position(spark, dir, "feed", "0", "g1").isEmpty)
  }

  test("BusyMonitor: classification and abend watchdog") {
    var now = 0L
    val mon = new Observability.BusyMonitor(() => now)
    mon.recordFailure("a-bad"); mon.recordFailure("a-bad")
    mon.recordNoProgress("a-stuck")
    mon.recordSuccess("a-ok")
    assert(mon.classify("a-ok") == Observability.Running)
    assert(mon.classify("a-bad") == Observability.Failing(2, 0L))
    assert(mon.classify("a-stuck") == Observability.Stuck(0L))
    now = 5000L
    val ex = intercept[Observability.HealthCheckException](mon.healthCheck(1000L))
    assert(ex.stuckStreams.map(_._1) == Seq("a-stuck"))
    assert(ex.failingStreams == Seq(("a-bad", 2)))
    // recovery clears
    mon.recordSuccess("a-bad"); mon.recordSuccess("a-stuck")
    mon.healthCheck(1000L) // no throw
  }

  test("dropDuplicatesWithinWatermark: event-id dedup under in-window redelivery") {
    // the event-time twin of write-position dedupe: each event_id is
    // admitted once while its state lives inside the watermark, so a
    // full redelivery batch must add nothing
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ev(id: Long) = (id, new java.sql.Timestamp(base.getTime + id * 1000L))
    val batch1 = (1L to 100L).map(ev) ++ (1L to 100L by 3).map(ev) // in-batch dups
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = input.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("ddww")
      .outputMode("append")
      .option("checkpointLocation", tmp("cp-ddww")).start()
    input.addData(batch1); q.processAllAvailable()
    val after1 = spark.table("ddww").select("event_id").as[Long].collect().sorted
    input.addData(batch1); q.processAllAvailable() // full redelivery
    q.stop()
    val after2 = spark.table("ddww").select("event_id").as[Long].collect().sorted
    assert(after1.toSeq == (1L to 100L))
    assert(after2.toSeq == after1.toSeq, "redelivered ids must not re-admit")
  }

  test("Tws state-schema evolution: a field added to value state restores from a v1 RocksDB changelog checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    // Avro state encoding is the evolution-capable format — it must be
    // chosen when the checkpoint is FIRST written (the format is
    // recorded in the state metadata; UnsafeRow-encoded state cannot
    // evolve). This test IS the upgrade recipe for BufferState: encode
    // as avro from day one, add fields as Option[...] (avro needs a
    // null default for restored rows), never remove or retype.
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
    try {
      val cp = tmp("cp-tws-evolve")
      val input = MemoryStream[(String, Long)]
      val delivered = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]

      def run(v2: Boolean) = {
        val ds = input.toDS()
        val out =
          if (v2) ds.groupByKey(_._1).transformWithState(new TallyProcessorV2,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          else ds.groupByKey(_._1).transformWithState(new TallyProcessorV1,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        out.writeStream
          .outputMode("append").option("checkpointLocation", cp)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long, Boolean)],
                           _: Long) =>
            val rows = batch.collect()
            delivered.synchronized { delivered ++= rows }
            ()
          }
          .start()
      }

      // phase 1: v1 state (total only) accumulates and checkpoints
      val q1 = run(v2 = false)
      input.addData(("k", 1L), ("k", 2L), ("j", 10L))
      q1.processAllAvailable()
      q1.stop()

      // phase 2: v2 processor (adds maxSeen: Option[Long]) restores the
      // SAME checkpoint — evolution means v1 rows come back with the
      // new field null, totals intact
      val q2 = run(v2 = true)
      input.addData(("k", 4L), ("j", 1L))
      q2.processAllAvailable()
      q2.stop()

      val rows = delivered.synchronized { delivered.toSet }
      // phase-1 emissions (v1 has no maxSeen → restoredWithoutMax=true by construction)
      assert(rows.contains(("k", 3L, true)) && rows.contains(("j", 10L, true)))
      // phase-2: totals CONTINUED from restored v1 state (7 = 3 + 4,
      // 11 = 10 + 1), and the added field restored as None
      assert(rows.contains(("k", 7L, true)) && rows.contains(("j", 11L, true)),
        s"v1 totals must survive the schema change; got $rows")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat")
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** v1 value state for the evolution test: running total only. */
case class TallyV1(total: Long)
/** v2: same field plus an ADDED Option field (avro null default). */
case class TallyV2(total: Long, maxSeen: Option[Long])

/** Emits (key, totalAfterBatch, maxSeenWasEmptyBeforeBatch). */
class TallyProcessorV1
  extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), (String, Long, Boolean)] {
  @transient private var tally: org.apache.spark.sql.streaming.ValueState[TallyV1] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    tally = getHandle.getValueState[TallyV1]("tally",
      org.apache.spark.sql.Encoders.product[TallyV1],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long, Boolean)] = {
    val prev = if (tally.exists()) tally.get() else TallyV1(0L)
    val next = TallyV1(prev.total + rows.map(_._2).sum)
    tally.update(next)
    Iterator((key, next.total, true))
  }
}

class TallyProcessorV2
  extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), (String, Long, Boolean)] {
  @transient private var tally: org.apache.spark.sql.streaming.ValueState[TallyV2] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    tally = getHandle.getValueState[TallyV2]("tally",
      org.apache.spark.sql.Encoders.product[TallyV2],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long, Boolean)] = {
    val prev = if (tally.exists()) tally.get() else TallyV2(0L, None)
    val vals = rows.map(_._2).toVector
    val next = TallyV2(prev.total + vals.sum,
      Some(math.max(prev.maxSeen.getOrElse(Long.MinValue), vals.max)))
    tally.update(next)
    Iterator((key, next.total, prev.maxSeen.isEmpty))
  }
}
