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
    // throttle:///… checkpoint dir = the download-bound recovery rig
    // (SCALING.md round 17): register the scheme's FileSystem /
    // AbstractFileSystem impls on the session's Hadoop conf — the same
    // conf the RocksDB file manager and the streaming checkpoint
    // manager resolve the cp path against — and thread the two knobs
    // through. Reads pay; writes (ingest) don't, so the cadence sweep
    // holds ingest fixed while recovery sees remote-store physics.
    if (sys.env.get("SPARK_GRAFT_CP_DIR").exists(_.startsWith("throttle:"))) {
      builder.config("spark.hadoop.fs.throttle.impl",
        "graft.streaming.ThrottledFileSystem")
      builder.config("spark.hadoop.fs.AbstractFileSystem.throttle.impl",
        "graft.streaming.ThrottledAbstractFs")
      sys.env.get("SPARK_GRAFT_THROTTLE_MBPS").foreach(m => builder.config(
        "spark.hadoop.fs.throttle.read.bytes.per.sec",
        (m.toLong * 1024L * 1024L).toString))
      sys.env.get("SPARK_GRAFT_THROTTLE_OPEN_MS").foreach(ms =>
        builder.config("spark.hadoop.fs.throttle.open.latency.ms", ms))
      // LIST/HEAD-class metadata latency (round 18): object stores
      // charge GET-class round-trips for listStatus/getFileStatus too;
      // without this knob restart file-discovery is free on the rig.
      sys.env.get("SPARK_GRAFT_THROTTLE_LIST_MS").foreach(ms =>
        builder.config("spark.hadoop.fs.throttle.list.latency.ms", ms))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // events → InputEvent in stream order (the envelope's per-stream
    // contiguous index), collected locally: MemoryStream is fed from
    // the driver by design, like the reference's MemoryStoreSource
    val evsAll = Envelope.fromEvents(Envelope.readTable(spark, sfDir, "events"))
      .select(col("stream_name"), col("idx"), col("event_type"),
        col("props").as("data"))
      .as[(String, Long, String, String)]
      .collect()
      .map { case (s, i, t, d) => InputEvent(s, i, t, d, d.length.toLong, isUnfold = false) }
    // SPARK_GRAFT_GAP_HOLD=<pct>: withhold the index-0 event for pct% of
    // streams, so everything behind the gap BUFFERS in the state store
    // (the gap hold-back semantic) instead of dispatching and draining.
    // This is the state-GROWTH knob the recovery-slope measurement
    // needs: in-order feeds leave ~50 bytes/stream (writePos only) —
    // restart cost is then all fixed overhead, and the changelog-replay
    // slope is invisible (the r15 frontier's honest caveat). Held
    // streams carry their full event payloads in BufferState.queue, so
    // state scales with the held fraction of the corpus (~100s of MB at
    // the 10x events tier), the replay-dominated regime.
    // murmur, not String.hashCode: the synthetic "user-N" names make
    // hashCode%100 wildly non-uniform (7.5% held where 50% was asked)
    val gapHoldPct = sys.env.get("SPARK_GRAFT_GAP_HOLD").map(_.toInt).getOrElse(0)
    def heldStream(s: String): Boolean = gapHoldPct > 0 &&
      math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s), 100) < gapHoldPct
    // SPARK_GRAFT_PAD_BYTES: inflate each HELD stream's event payload by
    // this many bytes. The fixture's props are ~tens of bytes, so even a
    // fully-buffered half-corpus is ~20 MB of store — far below the
    // replay-dominated regime the recovery-slope measurement needs;
    // production event bodies are KB-sized, and this knob restores that
    // mass where it matters (the buffered state) without touching the
    // dispatch path.
    val padBytes = sys.env.get("SPARK_GRAFT_PAD_BYTES").map(_.toInt).getOrElse(0)
    // INCOMPRESSIBLE per-event pad (seeded by the event identity, so
    // redelivery reproduces the same payload): a constant filler
    // compresses to ~nothing inside the store's snapshot zips and
    // changelog files — the first padded drive grew the on-disk state
    // 53 MB where ~270 MB was intended, keeping recovery floor-bound
    def padFor(e: InputEvent): String = {
      val rnd = new java.util.Random(e.streamName.hashCode.toLong << 32 | e.index)
      val sb = new java.lang.StringBuilder(padBytes + 16)
      while (sb.length < padBytes) sb.append(java.lang.Long.toHexString(rnd.nextLong()))
      sb.substring(0, padBytes)
    }
    val evs = evsAll
      .filterNot(e => e.index == 0L && heldStream(e.streamName))
      .map(e => if (padBytes > 0 && heldStream(e.streamName))
        e.copy(data = e.data + padFor(e), size = e.size + padBytes) else e)
    val nHeld = evsAll.length - evs.length
    val n = evs.length
    val per = math.max(1, n / batches)

    // SPARK_GRAFT_CP_DIR: checkpoint location override. Two uses: (a)
    // drive scripts scope their cleanup to dirs THEY created instead of
    // `rm -rf /tmp/streambench*` (which would eat a concurrent bench's
    // live checkpoint); (b) a scheme-qualified path (`throttle:///…`)
    // routes every checkpoint read through [[graft.streaming
    // .ThrottledFileSystem]] — the download-bound recovery rig.
    val cp = sys.env.getOrElse("SPARK_GRAFT_CP_DIR",
      java.nio.file.Files.createTempDirectory("streambench").toString)
    // Fail fast on a stale checkpoint (ADVICE r17, medium): if
    // SPARK_GRAFT_CP_DIR points at a dir that already has an offsets/
    // or state/ subtree (crashed prior run, script that forgot to
    // clean), the query would silently RESUME from it — wall_s, replay
    // debt, and recovery_s all corrupted with no signal in the emitted
    // JSON. The drive scripts rm -rf first; manual invocations get
    // this guard instead of a poisoned measurement.
    locally {
      val cpPath = new org.apache.hadoop.fs.Path(cp)
      val fs = cpPath.getFileSystem(spark.sessionState.newHadoopConf())
      val stale = Seq("offsets", "state").filter(d =>
        fs.exists(new org.apache.hadoop.fs.Path(cpPath, d)))
      if (stale.nonEmpty)
        sys.error(s"checkpoint dir $cp already contains ${stale.mkString("/")} " +
          "from a prior run — ingest would silently resume and every metric " +
          "would be wrong. Remove the dir (or point SPARK_GRAFT_CP_DIR at a " +
          "fresh one) and re-run.")
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[InputEvent]
    // dispatched-event counter for the recovery probe: a Spark
    // LongAccumulator, NOT a driver-local (captured by value into the
    // serialized task closure — the executor's copy increments and the
    // driver's stays 0; observed released_dispatch=0 against an
    // expected 496k) and NOT a module-field LongAdder (works only in
    // local mode where driver and executor share the JVM — on a real
    // cluster it reads 0 and the restore probe looks like state loss).
    // Accumulator updates merge back to the driver at task completion
    // on any deployment, so the probe is cluster-valid.
    val dispatched = spark.sparkContext.longAccumulator("graft.streambench.dispatched")
    val handle: (String, Seq[InputEvent]) => Long = (_, events) => {
      dispatched.add(events.size)
      events.map(_.size).sum
    }
    // gap-held streams only actually BUFFER under requireAll: with the
    // default island dispatch a gapped stream dispatches past the gap
    // and drains (the first padded drive measured 19 MB of state where
    // ~300 MB was intended — the knob without requireAll is a no-op)
    val requireAll = gapHoldPct > 0
    val out =
      if (engine.startsWith("tws")) graft.streaming.StreamProcessorTws.process[Long](
        input.toDS(), handle, requireAll = requireAll)
      else StreamProcessor.process[Long](input.toDS(), handle, requireAll = requireAll)
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
    // The restart's REPLAY DEBT, read from the checkpoint's state files
    // just before the timed restart: per partition, the changelog/delta
    // versions ABOVE the newest uploaded snapshot are exactly what the
    // restarted store must replay. Logged alongside recovery_s because
    // the background maintenance thread races the ingest tail — a
    // snapshot uploaded seconds before the restart silently shortens
    // the replay suffix, making same-knob reps incomparable unless the
    // debt is recorded (ADVICE r15: the 1.00-vs-1.56 s MIN_DELTAS=39
    // spread was this race, not noise).
    // walked through the checkpoint path's OWN Hadoop FileSystem (not
    // java.nio): the cp dir may carry a scheme (throttle:///…) and on a
    // cluster it is a DFS path — listing pays no throttle (only opens
    // do), so the debt read stays free even on the throttled rig
    def replayDebt(): (Long, Long) = {
      val stateRoot = new org.apache.hadoop.fs.Path(cp, "state")
      val fs = stateRoot.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(stateRoot)) return (0L, 0L)
      val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
      // manual listStatus recursion, NOT fs.listFiles(recursive): the
      // located-status iterator eagerly loads POSIX permissions, which
      // RawLocalFileSystem implements as `new java.io.File(uri)` — and
      // java.io.File rejects any scheme but file:, so a throttle:// cp
      // dir would throw. Names and types are all the debt read needs.
      def walk(p: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(p).foreach { st =>
          if (st.isDirectory) walk(st.getPath)
          else {
            val name = st.getPath.getName
            val (base, isSnap) =
              if (name.endsWith(".zip")) (name.dropRight(4), true)
              else if (name.endsWith(".snapshot")) (name.dropRight(9), true)
              else if (name.endsWith(".changelog")) (name.dropRight(10), false)
              else if (name.endsWith(".delta")) (name.dropRight(6), false)
              else ("", false)
            base.toLongOption.foreach(v =>
              files += ((st.getPath.getParent.toString, v, isSnap)))
          }
        }
      walk(stateRoot)
      val byDir = files.toVector.groupBy(_._1)
      val debts = byDir.values.map { fs2 =>
        val lastSnap = fs2.collect { case (_, v, true) => v }.maxOption.getOrElse(0L)
        fs2.count { case (_, v, snap) => !snap && v > lastSnap }.toLong
      }
      (debts.sum, byDir.values.map(_.count(_._3)).sum.toLong)
    }
    val recovery: Option[(Double, Long, Long, Long, Long, Long, Long, Long, Long, Long, String)] =
      if (!sys.env.get("SPARK_GRAFT_MEASURE_RECOVERY").contains("1")) None
      else {
        val (debt, nSnaps) = replayDebt()
        org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
        // SPARK_GRAFT_DROP_CACHES=1 (bench-only, needs root): evict the
        // OS page cache so the restart performs REAL storage reads. On
        // this rig RAM dwarfs any local checkpoint (125 GiB vs ≤1 GiB),
        // so a warm-cache "restart" replays at memory speed and the
        // snapshot-cadence knob measures flat — a cluster's recovery is
        // download/read-bound, which only a cold cache approximates.
        if (sys.env.get("SPARK_GRAFT_DROP_CACHES").contains("1")) {
          try new ProcessBuilder("sh", "-c", "sync && echo 3 > /proc/sys/vm/drop_caches")
            .start().waitFor()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[streambench] drop_caches failed: ${e.getMessage}") }
        }
        // SPARK_GRAFT_PAUSE_MAINTENANCE=1 (round 19): hold the
        // maintenance thread during the timed window so a mid-restart
        // snapshot upload can't add its throttled round-trips to the
        // measurement — the clean recovery floor the sizing formula
        // models. Production restarts DO race maintenance; cells
        // record their mode (maintenance_paused in the JSON) and the
        // race term is the paused/unpaused delta, measured not guessed.
        val pauseMaint = sys.env.get("SPARK_GRAFT_PAUSE_MAINTENANCE").contains("1")
        if (pauseMaint)
          org.apache.spark.sql.graftbridge.StateStoreBridge.setMaintenancePaused(true)
        graft.streaming.ThrottledFileSystem.resetCounters()
        val r0 = System.nanoTime()
        val q2 = out.writeStream.format("noop")
          .outputMode("append").option("checkpointLocation", cp).start()
        input.addData(evs.take(math.min(1000, n)).toIndexedSeq)
        q2.processAllAvailable()
        val r = (System.nanoTime() - r0) / 1e9
        if (pauseMaint)
          org.apache.spark.sql.graftbridge.StateStoreBridge.setMaintenancePaused(false)
        // what the timed restart actually READ through the throttle
        // scheme (0/0 when cp is a plain path): the opens count is the
        // per-file round-trip term, the bytes the bandwidth term —
        // committed alongside recovery_s so the cadence comparison
        // carries its read-volume evidence
        val (thrOpens, thrBytes) = graft.streaming.ThrottledFileSystem.counters()
        val thrLists = graft.streaming.ThrottledFileSystem.listCalls()
        val thrHeads = graft.streaming.ThrottledFileSystem.headCalls()
        val thrDriverMeta = graft.streaming.ThrottledFileSystem.driverMetaCalls()
        // thread-class histogram as a JSON object, keys sanitized and
        // sorted by count so the serial lanes read off the top
        val thrMetaThreads: String = graft.streaming.ThrottledFileSystem
          .metaThreadClasses().toSeq.sortBy(-_._2)
          .map { case (k, v) =>
            s""""${k.replaceAll("[^A-Za-z0-9#_ .:-]", "_")}":$v"""
          }.mkString("{", ",", "}")
        // Restored-state CORRECTNESS probe (gap-hold mode): release the
        // withheld index-0 events into the restarted query. If the
        // restore really rebuilt every held stream's buffered queue,
        // each release dispatches that stream's FULL history
        // (gap closed → whole island); if the snapshot/changelog path
        // lost state, only the bare index-0 events dispatch — so the
        // dispatched-event count is a store-content assertion, not a
        // timing. (Timed batch above excluded: its redelivered prefix
        // is writePos-deduped for non-held streams.)
        val heldEv0 = evsAll.filter(e => e.index == 0L && heldStream(e.streamName))
        val releasedDispatch: Long =
          if (heldEv0.isEmpty) -1L
          else {
            dispatched.reset()
            input.addData(heldEv0.toIndexedSeq)
            q2.processAllAvailable()
            dispatched.value
          }
        q2.stop()
        val expected =
          if (heldEv0.isEmpty) -1L else evsAll.count(e => heldStream(e.streamName)).toLong
        Some((math.round(r * 1000) / 1000.0, debt, nSnaps, releasedDispatch, expected,
          thrOpens, thrBytes, thrLists, thrHeads, thrDriverMeta, thrMetaThreads))
      }

    val eps = n / wallS
    // report the batches actually fed (grouped() yields ceil(n/per))
    println(
      s"""{"metric":"stream_events_per_sec","value":${eps.round},"unit":"events/sec",""" +
        s""""engine":"$engine","n_events":$n,"batches":$fed,""" +
        s""""state_partitions":$statePartitions,""" +
        s""""wall_s":${math.round(wallS * 1000) / 1000.0},""" +
        recovery.map { case (r, debt, snaps, got, want, thrOpens, thrBytes, thrLists, thrHeads, thrDriverMeta, thrMetaThreads) =>
          s""""recovery_s":$r,"replay_changelogs":$debt,"snapshots":$snaps,""" +
            s""""maintenance_paused":${sys.env.get("SPARK_GRAFT_PAUSE_MAINTENANCE").contains("1")},""" +
            (if (want >= 0) s""""released_dispatch":$got,"released_expected":$want,""" else "") +
            (if (thrOpens > 0 || thrLists > 0) // ADVICE r18: a zero-open restart must still carry its LIST evidence
              // lists = discovery round-trips only since r19; the
              // per-open HEADs (same latency class) are throttle_heads
              // — pre-r19 artifacts folded both into throttle_lists.
              // meta_driver = the subset of lists+heads made outside
              // any Spark task: serial driver-side discovery, the
              // component of LIST-latency recovery no partition lever
              // can shave (SCALING.md r19 follow-up 3 finding 3).
              s""""throttle_opens":$thrOpens,"throttle_read_mb":${thrBytes / (1024 * 1024)},""" +
                s""""throttle_lists":$thrLists,"throttle_heads":$thrHeads,""" +
                s""""throttle_meta_driver":$thrDriverMeta,""" +
                s""""throttle_meta_threads":$thrMetaThreads,"""
            else "")
        }.getOrElse("") +
        (if (gapHoldPct > 0) s""""gap_hold_pct":$gapHoldPct,"held_streams_ev0":$nHeld,""" else "") +
        (if (padBytes > 0) s""""pad_bytes":$padBytes,""" else "") +
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
