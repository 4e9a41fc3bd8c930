package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.PointerFile

/** Lease-based change-feed processing over a partitioned feed — the
  * Spark-native form of the reference's CosmosStoreSource /
  * ChangeFeedProcessor
  * (src/Propulsion.CosmosStore/ChangeFeedProcessor.fs:7-81,
  * CosmosStoreSource.fs:8-63, FeedObserver.fs:26,121-176).
  *
  * The reference delegates the distributed-coordination half to the
  * Cosmos SDK's ChangeFeedProcessorBuilder: a LEASE container holds one
  * lease per token range, competing processor INSTANCES acquire
  * expired/unowned leases and steal for even distribution, a handler
  * receives batches with a MANUAL checkpoint callback (continuation
  * token only advances when called → at-least-once), and a
  * ChangeFeedEstimator reports per-range remaining work. Those
  * semantics are re-expressed here against any shared filesystem:
  *
  *  - monitored feed = a parquet table carrying a token-range column
  *    (`rangeCol`, hash-assigned — [[ChangeFeed.withRanges]]) and a
  *    monotonically-increasing position (`posCol`); each poll is a
  *    pruned, pushed-down scan `range = r AND pos > continuation` —
  *    never a full-feed read;
  *  - lease = one file per range in a [[LeaseStore]] holding
  *    (owner, fence, expiresAt, continuation); every mutation is a
  *    FENCED compare-and-swap keyed on (owner, fence) — the moral
  *    equivalent of Cosmos' etag-conditional lease writes. A production
  *    deployment swaps the atomic-rename file CAS for a conditional
  *    PUT on an object store or a transactional table; the protocol is
  *    unchanged;
  *  - balancing: each instance bounds itself to
  *    ceil(ranges / live-owners) leases, acquiring free ones first and
  *    then stealing from owners holding more than their share — the
  *    SDK's even-distribution rule
  *    (ChangeFeedProcessor.fs:42-44 WithLeaseConfiguration). A stolen
  *    or expired lease keeps its continuation, so ownership moves
  *    without losing position;
  *  - fencing: an instance discovers it lost a lease when the CAS
  *    fails (fence moved on) and silently drops the range — a stale
  *    owner can never overwrite the new owner's checkpoint, which is
  *    exactly what the etag gives the reference;
  *  - manual checkpointing: the handler gets
  *    (ChangeFeedContext, batch, checkpoint); not calling checkpoint
  *    redelivers the page on the next poll
  *    (GetChangeFeedProcessorBuilderWithManualCheckpoint,
  *    ChangeFeedProcessor.fs:20-29);
  *  - `startFromTail` mirrors the reference's startFromTail vs
  *    WithStartTime(MinValue) choice (ChangeFeedProcessor.fs:46);
  *  - graceful `stop()` expires this instance's leases immediately so
  *    peers take over on their next acquire pass (StopAsync →
  *    lease release notifications, ChangeFeedProcessor.fs:76-78).
  *
  * Scale: lease traffic is O(nRanges) tiny files per poll (Cosmos
  * physical partitions — tens, not thousands) and feed reads are
  * per-range pruned scans executed by the cluster; the driver only ever
  * sees per-range scalar aggregates (page max position / row count),
  * the same shape as the reference's per-range continuation headers.
  */
object ChangeFeed {

  /** Assign token ranges by key hash: the analogue of Cosmos' fixed
    * hash-partitioned token-range space. Deterministic for a given
    * key column and range count, so re-deriving the frame never moves
    * a document between ranges. */
  def withRanges(df: DataFrame, keyCol: String, nRanges: Int,
      rangeCol: String = "range_id"): DataFrame =
    df.withColumn(rangeCol, pmod(xxhash64(col(keyCol)), lit(nRanges)).cast("int"))
}

/** Per-range lease record: `fence` is a monotonic write counter (the
  * etag analogue — every successful mutation bumps it), `continuation`
  * the checkpointed feed position (reference: the ContinuationToken
  * epoch, ChangeFeedProcessor.fs:24-25), `incarnation` the writing
  * instance's startup stamp — a restart of the same-named instance
  * carries a LATER incarnation, which is what lets it re-adopt its
  * crashed predecessor's live leases without two genuinely concurrent
  * same-named clones fence-stealing from each other every poll (each
  * clone's incarnation is ≥ the other's writes, so neither re-adopts;
  * leases written by pre-incarnation builds parse as 0 = any prior). */
final case class LeaseState(rangeId: Int, owner: String, fence: Long,
    expiresAtMs: Long, continuation: Long, incarnation: Long = 0L)

/** Batch context handed to the handler — group/range/epoch mirror the
  * reference's ChangeFeedContext (FeedObserver.fs:26). */
final case class ChangeFeedContext(group: String, rangeId: Int, epoch: Long,
    items: Long)

/** One lease file per range; all mutations go through a fenced CAS
  * (read → compare (owner, fence) → write temp → atomic rename).
  *
  * All I/O goes through the lease dir's OWN Hadoop FileSystem (round
  * 16 — the last coordination store off java.nio): lease-balanced
  * multi-instance processing is exactly the seam that must share a
  * filesystem on a cluster, so `hdfs://` / shared-mount lease dirs now
  * behave identically to local ones. Reads use the shared
  * [[graft.streaming.PointerFile]] EOF read (a concurrent atomic
  * rename between stat and read can otherwise truncate to a stale
  * prefix); writes stage to a nonce temp file and publish with
  * `FileContext.rename(OVERWRITE)` — atomic on local and HDFS. On an
  * object store where rename is copy+delete (S3A) the CAS loses
  * atomicity: point the lease dir at HDFS/EFS scratch, or swap this
  * class for a conditional PUT / transactional table — the protocol
  * above it is unchanged. The read-compare-rename window is the
  * documented caveat vs a true conditional write — the fence still
  * detects every lost race after the fact (the loser's next CAS
  * fails), so safety degrades to at-least-once, never to lost
  * checkpoints. Lease traffic is O(nRanges) tiny files per poll, so
  * per-call FileContext setup is noise. */
final class LeaseStore(dir: String, conf: Configuration = new Configuration()) {
  private val root = new HPath(dir)
  private val fs = root.getFileSystem(conf)
  fs.mkdirs(root)

  private def path(rangeId: Int): HPath = new HPath(root, s"lease-$rangeId")

  def read(rangeId: Int): Option[LeaseState] =
    PointerFile.readString(fs, path(rangeId)).map { s =>
      val kv = s.linesIterator.map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      LeaseState(rangeId, kv("owner"), kv("fence").toLong,
        kv("expires").toLong, kv("continuation").toLong,
        kv.get("incarnation").map(_.toLong).getOrElse(0L))
    }

  def readAll(nRanges: Int): Vector[Option[LeaseState]] =
    (0 until nRanges).toVector.map(read)

  /** Test seam (spec-only): runs inside the read-compare-rename window
    * — after the compare passed, before this CAS's write publishes. A
    * competing store's CAS landed here is exactly the lost race the
    * class scaladoc documents; ChangeFeedSpec drives it
    * deterministically to prove the at-least-once degradation rather
    * than argue it. */
  private[graft] var beforeRename: () => Unit = () => ()

  /** Fenced CAS: succeeds only if the stored (owner, fence) still
    * matches `expected` (None = no lease file yet). */
  def tryWrite(expected: Option[LeaseState], next: LeaseState): Boolean = {
    val cur = read(next.rangeId)
    if (cur.map(l => (l.owner, l.fence)) != expected.map(l => (l.owner, l.fence))) false
    else {
      beforeRename()
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val tmp = new HPath(root, s".lease-${next.rangeId}-$nonce.tmp")
      // the lease dir has no version GC: a write/rename failure must
      // delete its own nonce temp or repeated failures leave
      // .lease-N-*.tmp debris forever
      try {
        val out = fs.create(tmp, true)
        try out.write(
          (s"owner=${next.owner}\nfence=${next.fence}\nexpires=${next.expiresAtMs}\n" +
            s"continuation=${next.continuation}\nincarnation=${next.incarnation}\n")
            .getBytes("UTF-8"))
        finally out.close()
        val fc = FileContext.getFileContext(fs.getUri, conf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(path(next.rangeId)),
          Options.Rename.OVERWRITE)
      } catch {
        case e: Throwable =>
          try fs.delete(tmp, false) catch { case _: Throwable => () }
          throw e
      }
      true
    }
  }
}

/** One processor INSTANCE (reference: leaseOwnerId / WithInstanceName,
  * ChangeFeedProcessor.fs:45). Drive with repeated [[pollOnce]] (the
  * host's poll loop — feedPollInterval in the reference); the clock is
  * injected so tests exercise TTL expiry deterministically. */
final class ChangeFeedProcessor(
    spark: SparkSession,
    feedDir: String, rangeCol: String, posCol: String, nRanges: Int,
    leases: LeaseStore, group: String, ownerId: String,
    leaseTtlMs: Long, maxItems: Int,
    handler: (ChangeFeedContext, DataFrame, () => Unit) => Unit,
    clock: () => Long,
    startFromTail: Boolean = false) {

  // Startup stamp carried on every lease this instance writes: a
  // restart of the same-named instance has a LATER incarnation and may
  // re-adopt this one's live leases; a genuinely concurrent same-named
  // clone does NOT (its incarnation is not later than our writes), so
  // the misconfiguration self-throttles with a loud warning instead of
  // the two clones fence-stealing each other's ranges every poll
  // (sustained duplicate page processing, safety held only by CAS).
  private val incarnation: Long = clock()

  // rangeId -> the fence value we hold; losing a CAS (or seeing the
  // fence moved) drops the entry — fencing makes stale ownership
  // self-correcting
  private var ownedFences = Map.empty[Int, Long]

  // warn once per range about a live same-named peer we refuse to
  // re-adopt from (concurrent clone — an operator misconfiguration)
  private val warnedClone = collection.mutable.Set.empty[Int]

  def owned: Set[Int] = ownedFences.keySet

  /** The fence this instance believes it holds for `rangeId` — test /
    * observability hook; a claim is only VALID while this matches the
    * lease store's fence. */
  private[sources] def heldFence(rangeId: Int): Option[Long] =
    ownedFences.get(rangeId)

  private def feed: DataFrame = spark.read.parquet(feedDir)

  // startFromTail snapshot, taken once at instance start (reference:
  // startFromTail → no WithStartTime; MessageDbSource.fs:79-81 is the
  // same per-tranche max-position read). Driver sees nRanges scalars.
  private lazy val tailPositions: Map[Int, Long] =
    if (!startFromTail) Map.empty
    else feed.groupBy(col(rangeCol)).agg(max(col(posCol)).as("mx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  private def initialContinuation(rangeId: Int): Long =
    tailPositions.getOrElse(rangeId, -1L)

  /** Lease maintenance pass: drop fenced-off ranges, renew held
    * leases, acquire free ones up to the fair share, then steal from
    * surplus owners — the SDK's acquire/renew/steal cycle compressed
    * into one deterministic pass per poll. */
  private def maintainLeases(): Unit = {
    val now = clock()
    val before = leases.readAll(nRanges)
    // detect losses: the fence moved on (stolen / expired and retaken)
    ownedFences = ownedFences.filter { case (r, f) =>
      before(r).exists(l => l.owner == ownerId && l.fence == f)
    }
    // renew what we still hold
    for ((r, f) <- ownedFences) {
      val cur = before(r).get
      val next = cur.copy(fence = f + 1, expiresAtMs = now + leaseTtlMs,
        incarnation = incarnation)
      if (leases.tryWrite(Some(cur), next)) ownedFences += r -> next.fence
      else ownedFences -= r
    }
    val all = leases.readAll(nRanges)
    val live = all.flatten.filter(_.expiresAtMs > now)
    val owners = live.map(_.owner).toSet + ownerId
    val fairShare = math.ceil(nRanges.toDouble / owners.size).toInt
    // acquire unowned / expired ranges (continuation preserved). A
    // live lease BEARING OUR OWN NAME but absent from ownedFences and
    // stamped with an EARLIER incarnation is a previous incarnation of
    // this instance (we crashed and restarted inside the TTL — found
    // by the sync-feed crash drive: the resume spun 100 polls waiting
    // out its own 60 s leases); the reference processor re-acquires
    // its own leases immediately on restart, so re-adopt it with a
    // fence bump. A live same-named lease at OUR OR A LATER
    // incarnation is a concurrent clone (shared-instance-name
    // misconfiguration): re-adopting it would have the two clones
    // fence-stealing each other's ranges every poll — sustained
    // duplicate page processing — so skip it and warn loudly instead.
    var i = 0
    while (ownedFences.size < fairShare && i < nRanges) {
      if (!ownedFences.contains(i)) {
        val cur = all(i)
        if (cur.forall(l => l.expiresAtMs <= now ||
            (l.owner == ownerId && l.incarnation < incarnation))) {
          val next = LeaseState(i, ownerId, cur.map(_.fence + 1).getOrElse(1L),
            now + leaseTtlMs, cur.map(_.continuation).getOrElse(initialContinuation(i)),
            incarnation)
          if (leases.tryWrite(cur, next)) ownedFences += i -> next.fence
        } else if (cur.exists(l => l.owner == ownerId && l.expiresAtMs > now) &&
            warnedClone.add(i)) {
          System.err.println(
            s"[changefeed] WARNING: range $i is held live by another instance named " +
              s"'$ownerId' at incarnation >= ours — a concurrent same-named clone " +
              "(misconfiguration); refusing to re-adopt. Give each instance a " +
              "unique instance name.")
        }
      }
      i += 1
    }
    // steal from owners above their share (even distribution; the
    // victim's next renew CAS fails and it drops the range)
    if (ownedFences.size < fairShare) {
      val surplus = live.filter(_.owner != ownerId)
        .groupBy(_.owner).valuesIterator
        .flatMap(ls => ls.sortBy(_.rangeId).drop(fairShare))
        .toVector.sortBy(_.rangeId)
      for (l <- surplus if ownedFences.size < fairShare) {
        val next = l.copy(owner = ownerId, fence = l.fence + 1,
          expiresAtMs = now + leaseTtlMs, incarnation = incarnation)
        if (leases.tryWrite(Some(l), next)) ownedFences += l.rangeId -> next.fence
      }
    }
  }

  /** The page scan for one range: with a `partitionBy(rangeCol)` feed
    * layout the range predicate is a PARTITION filter (the directory
    * is dropped at scan planning — the reference's per-token-range
    * feed read), and the position predicate pushes into parquet. */
  private[sources] def pageFor(rangeId: Int, continuation: Long): DataFrame =
    feed
      .where(col(rangeCol) === lit(rangeId) && col(posCol) > lit(continuation))
      .orderBy(col(posCol)).limit(maxItems)

  /** One poll: maintain leases, then for each owned range read the
    * next page past the checkpointed continuation and hand it to the
    * handler with its manual-checkpoint callback. */
  def pollOnce(): Unit = {
    maintainLeases()
    for (r <- ownedFences.keySet.toVector.sorted) {
      val cont = leases.read(r)
        .filter(l => l.owner == ownerId && ownedFences.get(r).contains(l.fence))
        .map(_.continuation).getOrElse(-1L)
      val page = pageFor(r, cont)
      val head = page.agg(max(col(posCol)).as("mx"), count(lit(1)).as("n")).first()
      if (!head.isNullAt(0)) {
        val epoch = head.getLong(0)
        val ctx = ChangeFeedContext(group, r, epoch, head.getLong(1))
        val checkpoint: () => Unit = () => {
          leases.read(r)
            .filter(l => l.owner == ownerId && ownedFences.get(r).contains(l.fence))
            .foreach { l =>
              val next = l.copy(fence = l.fence + 1, continuation = epoch,
                expiresAtMs = clock() + leaseTtlMs, incarnation = incarnation)
              if (leases.tryWrite(Some(l), next)) ownedFences += r -> next.fence
              else ownedFences -= r // fenced off mid-batch: new owner wins
            }
        }
        handler(ctx, page, checkpoint)
      }
    }
  }

  /** This feed's estimator frame (range_id, read_position,
    * completed_position, gap). */
  def lag(): DataFrame =
    ChangeFeedEstimator.lag(spark, feedDir, rangeCol, posCol, nRanges, leases)

  /** Poll until the estimator reports zero remaining work — the
    * reference's single-pass / catch-up drive (SinglePassFeedSource,
    * FeedMonitor.AwaitCompletion). Only meaningful when this instance
    * can acquire every range (no competing live instance — a range
    * held by a live peer never drains from here); returns the polls
    * used, throws if `maxPolls` is exhausted first. */
  def runUntilCaughtUp(maxPolls: Int = 100): Int = {
    import spark.implicits._
    def gap(): Long = lag().select(col("gap")).as[Long].collect().sum
    var polls = 0
    while (gap() > 0 && polls < maxPolls) { pollOnce(); polls += 1 }
    require(gap() == 0L, s"change feed not caught up after $maxPolls polls")
    polls
  }

  /** Graceful shutdown: expire our leases NOW (continuation kept) so
    * peers take over on their next acquire pass instead of waiting out
    * the TTL. */
  def stop(): Unit = {
    for ((r, f) <- ownedFences) {
      leases.read(r).filter(l => l.owner == ownerId && l.fence == f).foreach { l =>
        leases.tryWrite(Some(l), l.copy(fence = f + 1, expiresAtMs = clock()))
      }
    }
    ownedFences = Map.empty
  }
}

/** Per-range remaining work = docs past the checkpointed continuation —
  * the reference's GetChangeFeedEstimator / runEstimation
  * (ChangeFeedProcessor.fs:52-67), as one pruned scan joined with the
  * (broadcast, nRanges-row) lease snapshot. */
object ChangeFeedEstimator {

  /** (range_id, read_position, completed_position, gap) — gap in
    * DOCUMENTS per range (the reference's EstimatedLag is an item
    * count): one scan, counting rows past each range's continuation,
    * sorted by range (the reference sorts estimator states the same
    * way before reporting). */
  def lag(spark: SparkSession, feedDir: String, rangeCol: String,
      posCol: String, nRanges: Int, leases: LeaseStore): DataFrame = {
    import spark.implicits._
    val conts = leases.readAll(nRanges).flatten
      .map(l => (l.rangeId, l.continuation)).toDF("r", "completed_position")
    spark.read.parquet(feedDir)
      .join(broadcast(conts), col(rangeCol) === col("r"), "left")
      .groupBy(col(rangeCol).as("range_id"))
      .agg(
        max(col(posCol)).as("read_position"),
        max(coalesce(col("completed_position"), lit(-1L))).as("completed_position"),
        count(when(col(posCol) > coalesce(col("completed_position"), lit(-1L)), 1))
          .as("gap"))
      .orderBy(col("range_id"))
  }
}

/** The reference's lag-estimation reporting surface
  * (ChangeFeedProcessor.fs:52-67 runEstimation → Stats
  * .ReportEstimation → Prometheus gauges, FeedObserver.fs:60-71): the
  * estimator published as live Dropwizard gauges, registerable on the
  * same MetricRegistry [[graft.streaming.MetricsExport]] ships to
  * every configured Spark sink. One estimator scan serves all three
  * gauges per scrape window (snapshots memoize for `minIntervalMs`,
  * so a scrape storm cannot multiply scans — the reference throttles
  * the same way with lagEstimationInterval). */
final class ChangeFeedMonitor(lagFrame: () => org.apache.spark.sql.DataFrame,
    minIntervalMs: Long = 1000L) {

  @volatile private var cached: (Long, (Long, Long, Long)) = (Long.MinValue, (0L, 0L, 0L))

  /** (total gap docs, max per-range gap, ranges behind). */
  def snapshot(): (Long, Long, Long) = {
    val now = System.nanoTime()
    val (t, v) = cached
    if (t != Long.MinValue && now - t < minIntervalMs * 1000000L) v
    else {
      val gaps = lagFrame().select(org.apache.spark.sql.functions.col("gap"))
        .collect().map(_.getLong(0))
      val v2 = (gaps.sum, if (gaps.isEmpty) 0L else gaps.max,
        gaps.count(_ > 0L).toLong)
      cached = (now, v2)
      v2
    }
  }

  /** Register the gauges under `prefix` (reference names: the Lag
    * metric's gapDocs / laggingPartitions breakdown). */
  def register(r: com.codahale.metrics.MetricRegistry, prefix: String): Unit = {
    def gauge(name: String)(f: => Long): Unit =
      r.register(s"$prefix.$name", new com.codahale.metrics.Gauge[Long] {
        override def getValue: Long = f
      })
    gauge("changefeed_lag_docs_total")(snapshot()._1)
    gauge("changefeed_lag_docs_max_range")(snapshot()._2)
    gauge("changefeed_ranges_behind")(snapshot()._3)
  }
}
