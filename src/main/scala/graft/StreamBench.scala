package graft

import graft.model.Envelope
import graft.streaming.{InputEvent, StreamProcessor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-engine throughput bench (not driver-run; numbers recorded
  * in BASELINE.md): pushes the events table through the span engine —
  * the reference's MemoryStoreSource → Scheduler/Dispatcher path — in
  * fixed-size micro-batches and reports end-to-end events/sec,
  * including per-stream span coalescing, write-pos dedupe, and handler
  * dispatch. Throughput scales with stream cardinality (per-stream
  * serialization is the ordering contract), so the events table's
  * ~10k users at sf0.1 is the interesting regime.
  *
  * args: [batches] [statePartitions] [engine]. engine = `fmgws`
  * (default: flatMapGroupsWithState on the HDFS-backed store) or `tws`
  * (transformWithState on RocksDB with changelog checkpointing — the
  * claimed 100 TB state path; same pure `step`, so the comparison
  * isolates the state-backend cost), or `chain` — the composed ingest
  * chain over the documents table: NearDupStream (minhash-LSH gate,
  * quarantine ON) → PackStream over the kept set, reported as
  * end-to-end docs/sec including the quarantine/kept/index writes and
  * the pack state commit per micro-batch.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    // state-store partition count: fixed at first checkpoint, sized so
    // per-micro-batch task+commit overhead doesn't swamp small batches
    val statePartitions = args.lift(1).map(_.toInt).getOrElse(32)
    val engine = args.lift(2).getOrElse("fmgws")
    if (engine == "chain") {
      chain(sfDir, batches, statePartitions,
        compactEvery = args.lift(3).map(_.toInt).getOrElse(0))
      return
    }
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", statePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // tws = RocksDB + changelog checkpointing (the claimed 100 TB state
    // path); tws-nocl = RocksDB with full-snapshot checkpointing, which
    // isolates how much of the tws premium is the per-batch changelog
    // write vs RocksDB/JNI itself
    if (engine.startsWith("tws")) {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        (engine != "tws-nocl").toString)
    }
    // snapshot cadence (versions between full-snapshot uploads): under
    // changelog checkpointing this bounds how many changelog files a
    // cold restart must REPLAY on top of the last snapshot — the
    // ingest-throughput-vs-recovery-time knob a cluster operator tunes
    // (round-15 frontier measurement, BASELINE.md)
    sys.env.get("SPARK_GRAFT_MIN_DELTAS").foreach { d =>
      builder.config("spark.sql.streaming.stateStore.minDeltasForSnapshot", d)
    }
    // snapshot uploads happen on the background maintenance thread
    // (default every 60 s — longer than a whole bench run, which would
    // make every changelog config replay the full history on restart
    // and hide the cadence knob); the frontier runs set this to a few
    // seconds, approximating a cluster executor's continuous background
    // maintenance over a long-lived job
    sys.env.get("SPARK_GRAFT_MAINTENANCE_MS").foreach { ms =>
      builder.config("spark.sql.streaming.stateStore.maintenanceInterval", s"${ms}ms")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // events → InputEvent in stream order (the envelope's per-stream
    // contiguous index), collected locally: MemoryStream is fed from
    // the driver by design, like the reference's MemoryStoreSource
    val evs = Envelope.fromEvents(Envelope.readTable(spark, sfDir, "events"))
      .select(col("stream_name"), col("idx"), col("event_type"),
        col("props").as("data"))
      .as[(String, Long, String, String)]
      .collect()
      .map { case (s, i, t, d) => InputEvent(s, i, t, d, d.length.toLong, isUnfold = false) }
    val n = evs.length
    val per = math.max(1, n / batches)

    val cp = java.nio.file.Files.createTempDirectory("streambench").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[InputEvent]
    val handle: (String, Seq[InputEvent]) => Long = (_, events) => events.map(_.size).sum
    val out =
      if (engine.startsWith("tws")) graft.streaming.StreamProcessorTws.process[Long](input.toDS(), handle)
      else StreamProcessor.process[Long](input.toDS(), handle)
    val q = out.writeStream.format("noop")
      .outputMode("append").option("checkpointLocation", cp).start()

    val t0 = System.nanoTime()
    var fed = 0
    evs.grouped(per).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable() // one micro-batch per feed, like a tranche page
      fed += 1
    }
    val wallS = (System.nanoTime() - t0) / 1e9
    q.stop()

    // Recovery half of the frontier (SPARK_GRAFT_MEASURE_RECOVERY=1):
    // stop the query, force-unload every loaded state-store provider
    // (cold executor, as after a real failure — the restarted query
    // must re-download the last snapshot and replay the changelog
    // suffix for all partitions), then restart from the SAME
    // checkpoint and time restart→first-batch-complete. The fed chunk
    // replays already-seen events; writePos dedupe makes that a no-op
    // for output, so the measured wall is state reload + one
    // micro-batch, the cluster's fail-over number.
    val recoveryS: Option[Double] =
      if (!sys.env.get("SPARK_GRAFT_MEASURE_RECOVERY").contains("1")) None
      else {
        org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
        val r0 = System.nanoTime()
        val q2 = out.writeStream.format("noop")
          .outputMode("append").option("checkpointLocation", cp).start()
        input.addData(evs.take(math.min(1000, n)).toIndexedSeq)
        q2.processAllAvailable()
        val r = (System.nanoTime() - r0) / 1e9
        q2.stop()
        Some(math.round(r * 1000) / 1000.0)
      }

    val eps = n / wallS
    // report the batches actually fed (grouped() yields ceil(n/per))
    println(
      s"""{"metric":"stream_events_per_sec","value":${eps.round},"unit":"events/sec",""" +
        s""""engine":"$engine","n_events":$n,"batches":$fed,""" +
        s""""state_partitions":$statePartitions,""" +
        s""""wall_s":${math.round(wallS * 1000) / 1000.0},""" +
        recoveryS.map(r => s""""recovery_s":$r,""").getOrElse("") +
        sys.env.get("SPARK_GRAFT_MIN_DELTAS").map(d => s""""min_deltas":$d,""").getOrElse("") +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }

  /** Composed-gate chain: documents → NearDupStream (minhash-LSH gate,
    * quarantine on) → PackStream over the kept set. Each admitted
    * micro-batch runs the near-dup drop/persist/marker protocol (index
    * scan + kept/quarantine/index writes), then the kept docs are fed
    * to the packing gate and its micro-batch is driven to completion —
    * the synchronous per-page admission a composed ingest pipeline
    * performs. docs/sec is end-to-end: both gates' work plus all
    * persistence, first feed to last pack commit.
    *
    * `compactEvery` > 0 folds the bucket index every N admitted pages
    * (NearDupStream.compactIndex — safe here because the chain is the
    * gate's only writer and runs it between pages, i.e. quiescent): a
    * weeks-long ingestion otherwise accumulates one index partition
    * per page and every page's scan re-lists them all. */
  private def chain(sfDir: String, batches: Int, statePartitions: Int,
      compactEvery: Int = 0): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", statePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.{NearDupStream, PackInput, PackStream}

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .as[(Long, String, String, Long)]
      .orderBy(col("doc_id")) // the ordered-ingest contract Pack requires
      .collect()
    val n = docs.length
    val per = math.max(1, n / batches)

    val root = java.nio.file.Files.createTempDirectory("chainbench").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val packIn = MemoryStream[PackInput]
    val packed = PackStream.process(packIn.toDS(), 512L,
      Some(PackStream.dropCounter(spark)))
    val pq = packed.writeStream.format("noop")
      .outputMode("append").option("checkpointLocation", s"$root/cp-pack").start()

    val t0 = System.nanoTime()
    var bid = 0L
    var keptTotal = 0L
    // software-pipelined composed chain (round 15): the gate's
    // admission (page N+1) overlaps the Pack state commit (page N) —
    // the two touch DISJOINT state (gate: index/kept/quar dirs under
    // the marker fence; Pack: its own streaming checkpoint), so the
    // per-page wall cost is max(admission, pack-commit) instead of the
    // sum. Feed order into Pack is unchanged (one outstanding commit,
    // awaited before the next feed), so the packed output is
    // bit-identical to the sequential form.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    var packCommit: Option[Future[Unit]] = None
    docs.grouped(per).foreach { chunk =>
      val batchDf = chunk.toIndexedSeq
        .toDF("doc_id", "source", "text", "n_words")
      // the returned kept frame IS the verdict the gate just paid for —
      // no per-page parquet read-back of kept/batch=N (half the
      // round-14 per-page floor). K-bounded collect: |kept| ≤ batch.
      val kept = NearDupStream.processBatch(batchDf, bid, s"$root/index", s"$root/kept",
        Some(s"$root/quar"), Seq("doc_id", "source", "text", "n_words"))
        .select(col("source"), col("doc_id"), col("n_words"))
        .as[(String, Long, Long)].collect()
        .map { case (s, d, w) => PackInput(s, d, w) }
      keptTotal += kept.length
      packCommit.foreach(Await.result(_, Duration.Inf)) // page N-1's commit
      if (kept.nonEmpty) {
        packIn.addData(kept.toIndexedSeq)
        packCommit = Some(Future { pq.processAllAvailable() })
      }
      bid += 1
      // compaction may overlap the in-flight Pack commit (disjoint
      // state) but never an admission — the loop is past this page's
      // gate and the next page's hasn't started
      if (compactEvery > 0 && bid % compactEvery == 0)
        NearDupStream.compactIndex(spark, s"$root/index")
    }
    packCommit.foreach(Await.result(_, Duration.Inf))
    val wallS = (System.nanoTime() - t0) / 1e9
    pq.stop()
    val nQuar = spark.read.parquet(s"$root/quar").count()
    println(
      s"""{"metric":"chain_docs_per_sec","value":${(n / wallS).round},"unit":"docs/sec",""" +
        s""""engine":"chain","n_docs":$n,"n_kept":$keptTotal,"n_quarantined":$nQuar,""" +
        s""""batches":$bid,"state_partitions":$statePartitions,""" +
        s""""wall_s":${math.round(wallS * 1000) / 1000.0},""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
