package graft.sources

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Lease-based change-feed processing (SURVEY §2.1 CosmosStoreSource:
  * the reference wraps the Cosmos ChangeFeedProcessor — lease-balanced
  * token ranges, manual checkpointing, lag estimation;
  * src/Propulsion.CosmosStore/ChangeFeedProcessor.fs:7-81). The specs
  * drive two competing instances against one lease store with an
  * injected clock: fair-share split, fenced steal, manual-checkpoint
  * redelivery, TTL failover with continuation handoff, and the
  * estimator draining to zero. */
class ChangeFeedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-changefeed-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cf-$tag").toString

  private val N_RANGES = 4

  /** events slice → a range-partitioned feed with event_id as the
    * monotonic position. */
  private def writeFeed(dir: String, limit: Int): Set[Long] = {
    val feed = ChangeFeed.withRanges(
      Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
        .orderBy(col("event_id")).limit(limit)
        .select(col("event_id").cast("long").as("pos"),
          col("user_id"), col("event_type")),
      "user_id", N_RANGES)
    feed.write.mode(SaveMode.Overwrite).partitionBy("range_id").parquet(dir)
    import spark.implicits._
    spark.read.parquet(dir).select("pos").as[Long].collect().toSet
  }

  /** Handler capturing processed positions per instance; checkpoints
    * every batch unless told not to. */
  private final class Capture(checkpointEvery: Boolean = true) {
    val seen = collection.mutable.ArrayBuffer.empty[Long]
    var batches = 0
    def handler: (ChangeFeedContext, DataFrame, () => Unit) => Unit =
      (ctx, page, checkpoint) => {
        import spark.implicits._
        val ps = page.select("pos").as[Long].collect()
        assert(ps.nonEmpty && ps.max == ctx.epoch,
          "epoch must be the page's max position")
        seen ++= ps
        batches += 1
        if (checkpointEvery) checkpoint()
      }
  }

  private def totalGap(feedDir: String, leases: LeaseStore): Long = {
    import spark.implicits._
    ChangeFeedEstimator.lag(spark, feedDir, "range_id", "pos", N_RANGES, leases)
      .select("gap").as[Long].collect().sum
  }

  test("single instance drains the feed exactly once; estimator reaches zero") {
    val feedDir = tmp("feed1"); val all = writeFeed(feedDir, 120)
    val leases = new LeaseStore(tmp("leases1"))
    var now = 1000L
    val cap = new Capture()
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", leaseTtlMs = 60000L, maxItems = 25,
      handler = cap.handler, clock = () => now)
    var rounds = 0
    while (totalGap(feedDir, leases) > 0 && rounds < 30) {
      a.pollOnce(); now += 100; rounds += 1
    }
    assert(a.owned == (0 until N_RANGES).toSet, "sole instance owns every range")
    assert(cap.seen.size == cap.seen.toSet.size, "no duplicate deliveries when every batch checkpoints")
    assert(cap.seen.toSet == all, "every document delivered")
    assert(totalGap(feedDir, leases) == 0L)
    // paging actually happened (120 docs / 25 per page / 4 ranges)
    assert(cap.batches > N_RANGES)
  }

  test("a restarted instance re-adopts its own un-expired leases immediately") {
    val feedDir = tmp("feed-restart"); val all = writeFeed(feedDir, 120)
    val leases = new LeaseStore(tmp("leases-restart"))
    var now = 1000L
    val cap1 = new Capture()
    val a1 = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", leaseTtlMs = 60000L, maxItems = 25,
      handler = cap1.handler, clock = () => now)
    a1.pollOnce() // claims all ranges, checkpoints one page each
    val claimed = cap1.seen.toSet
    assert(claimed.nonEmpty && a1.owned == (0 until N_RANGES).toSet)
    // CRASH: no stop(), leases stay live for the full TTL. A restart
    // with the SAME instance name must resume NOW, not after 60 s —
    // the reference processor re-acquires its own leases on startup
    // (found by tools/sync_feed_crash_drive.sh: the resume spun its
    // poll budget waiting out its own leases)
    now += 1000 // well inside the TTL
    val cap2 = new Capture()
    val a2 = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", leaseTtlMs = 60000L, maxItems = 25,
      handler = cap2.handler, clock = () => now)
    var rounds = 0
    while (totalGap(feedDir, leases) > 0 && rounds < 30) {
      a2.pollOnce(); now += 100; rounds += 1
    }
    assert(a2.owned == (0 until N_RANGES).toSet, "restart re-adopted its own leases")
    // continuation preserved: the restart delivers exactly the suffix
    assert(cap2.seen.toSet == (all -- claimed), "resume = exact un-checkpointed suffix")
    assert(totalGap(feedDir, leases) == 0L)
  }

  test("concurrent same-named clones do not churn: a later incarnation adopts once, an equal one self-throttles") {
    val feedDir = tmp("feed-clone"); writeFeed(feedDir, 120)
    val leases = new LeaseStore(tmp("leases-clone"))
    var now = 1000L
    val capA = new Capture(); val capB = new Capture(); val capC = new Capture()
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", 60000L, 25, capA.handler, () => now)
    a.pollOnce()
    assert(a.owned == (0 until N_RANGES).toSet)
    // clone at the SAME incarnation instant (same clock value): must
    // NOT re-adopt A's live leases — it self-throttles (the pre-fix
    // behavior for misconfigured shared names), never fence-steals
    val b = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", 60000L, 25, capB.handler, () => now)
    b.pollOnce()
    assert(b.owned.isEmpty, "an equal-incarnation clone must not adopt live leases")
    a.pollOnce()
    assert(a.owned == (0 until N_RANGES).toSet, "A keeps every range — no churn")
    // a LATER incarnation (restart semantics) adopts exactly once; the
    // elder then drops and does NOT steal back — ownership converges
    now += 1000
    val c = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", 60000L, 25, capC.handler, () => now)
    c.pollOnce()
    assert(c.owned == (0 until N_RANGES).toSet, "later incarnation re-adopts")
    a.pollOnce(); a.pollOnce()
    assert(a.owned.isEmpty, "the elder incarnation drops and never steals back")
    c.pollOnce()
    assert(c.owned == (0 until N_RANGES).toSet)
  }

  test("a second instance steals to an even split; fenced loser drops silently") {
    val feedDir = tmp("feed2"); writeFeed(feedDir, 120)
    val leases = new LeaseStore(tmp("leases2"))
    var now = 1000L
    val capA = new Capture(); val capB = new Capture()
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", 60000L, 25, capA.handler, () => now)
    val b = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-B", 60000L, 25, capB.handler, () => now)
    a.pollOnce() // alone: A takes all four ranges
    assert(a.owned == (0 until N_RANGES).toSet)
    b.pollOnce() // B sees two live owners → fair share 2 → steals 2
    assert(b.owned.size == 2, s"B should steal to fair share, owned ${b.owned}")
    a.pollOnce() // A's renew CAS fails on the stolen fences → drops them
    assert(a.owned.size == 2)
    assert((a.owned & b.owned).isEmpty, "fencing forbids shared ownership")
    assert(a.owned ++ b.owned == (0 until N_RANGES).toSet)
  }

  test("manual checkpoint: an uncheckpointed page is redelivered; continuation survives failover") {
    val feedDir = tmp("feed3"); val all = writeFeed(feedDir, 120)
    val leases = new LeaseStore(tmp("leases3"))
    var now = 1000L
    // A checkpoints nothing: every poll redelivers the same first pages
    val capA = new Capture(checkpointEvery = false)
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", leaseTtlMs = 5000L, maxItems = 25,
      capA.handler, () => now)
    a.pollOnce(); val firstPass = capA.seen.toVector
    a.pollOnce()
    assert(capA.seen.toVector == firstPass ++ firstPass,
      "without checkpoint the same pages redeliver (at-least-once)")
    assert(totalGap(feedDir, leases) == all.size.toLong, "continuations never advanced")

    // now A checkpoints one round of pages, then vanishes (no renew)
    val capA2 = new Capture()
    val a2 = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A2", leaseTtlMs = 5000L, maxItems = 25,
      capA2.handler, () => now)
    a2.pollOnce()
    val committed = capA2.seen.toSet
    assert(committed.nonEmpty && totalGap(feedDir, leases) == (all.size - committed.size).toLong)

    // TTL passes; B acquires the expired leases WITH A2's continuations
    now += 10000L
    val capB = new Capture()
    val b = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-B", leaseTtlMs = 5000L, maxItems = 25,
      capB.handler, () => now)
    var rounds = 0
    while (totalGap(feedDir, leases) > 0 && rounds < 30) {
      b.pollOnce(); now += 100; rounds += 1
    }
    assert(b.owned == (0 until N_RANGES).toSet, "expired leases all acquired")
    assert(capB.seen.toSet == all -- committed,
      "failover resumes from the checkpointed continuation — no loss, no re-read of committed pages")
  }

  test("the per-range page scan prunes partitions and pushes the position filter") {
    val feedDir = tmp("feed-plan"); writeFeed(feedDir, 120)
    val leases = new LeaseStore(tmp("leases-plan"))
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", 60000L, 25,
      (_, _, _) => (), () => 1000L)
    val plan = a.pageFor(2, 10L).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*range_id[^\\]]*\\].*"),
      s"range predicate must prune at scan planning:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(pos,10)"),
      s"position predicate must reach parquet:\n$plan")
  }

  test("monitor gauges track the drain; runUntilCaughtUp drives to zero lag") {
    val feedDir = tmp("feed-mon"); val all = writeFeed(feedDir, 100)
    val leases = new LeaseStore(tmp("leases-mon"))
    var now = 1000L
    val cap = new Capture()
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", 60000L, 25, cap.handler, () => now)
    val monitor = new ChangeFeedMonitor(() => a.lag(), minIntervalMs = 0L)
    val registry = new com.codahale.metrics.MetricRegistry
    monitor.register(registry, "graft")
    def g(name: String): Long =
      registry.getGauges.get(s"graft.$name").getValue.asInstanceOf[Long]
    assert(g("changefeed_lag_docs_total") == all.size.toLong)
    assert(g("changefeed_ranges_behind") > 0L)
    assert(g("changefeed_lag_docs_max_range") > 0L)
    val polls = a.runUntilCaughtUp(maxPolls = 30)
    assert(polls > 1, "paging forces multiple polls") // 100 docs / 25-page / range
    assert(cap.seen.toSet == all)
    assert(g("changefeed_lag_docs_total") == 0L)
    assert(g("changefeed_ranges_behind") == 0L)
  }

  test("graceful stop releases leases immediately and startFromTail skips the backlog") {
    val feedDir = tmp("feed4"); val all = writeFeed(feedDir, 80)
    val leases = new LeaseStore(tmp("leases4"))
    var now = 1000L
    val capA = new Capture()
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-A", leaseTtlMs = 60000L, maxItems = 100,
      capA.handler, () => now)
    a.pollOnce()
    a.stop() // expires leases NOW — no TTL wait for the peer
    assert(a.owned.isEmpty)
    val capB = new Capture()
    val b = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      leases, "grp", "instance-B", leaseTtlMs = 60000L, maxItems = 100,
      capB.handler, () => now) // same clock instant: released ≠ TTL'd
    b.pollOnce()
    assert(b.owned == (0 until N_RANGES).toSet)
    assert(capB.seen.isEmpty, "A checkpointed everything before stopping; B re-reads nothing")

    // startFromTail: a fresh group's instance snapshots the tail and
    // never sees the backlog
    val tailLeases = new LeaseStore(tmp("leases4-tail"))
    val capT = new Capture()
    val t = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", N_RANGES,
      tailLeases, "grp-tail", "instance-T", 60000L, 100, capT.handler,
      () => now, startFromTail = true)
    t.pollOnce()
    assert(capT.seen.isEmpty, s"startFromTail must skip the ${all.size}-doc backlog")
    assert(totalGap(feedDir, tailLeases) == 0L)
  }

  test("a scheme-qualified lease-dir URI shares state with the plain-path store") {
    // Round 16: LeaseStore went through the lease dir's OWN Hadoop
    // FileSystem (the last coordination store off java.nio). The
    // contract that matters on a cluster: two instances given the same
    // dir under different spellings (plain path vs file:-scheme URI —
    // the local stand-in for hdfs://) coordinate through ONE store.
    val dir = tmp("leases-scheme")
    val plain = new LeaseStore(dir)
    val viaUri = new LeaseStore(s"file:$dir")
    val l1 = LeaseState(0, "owner-A", 1L, 99999L, 42L, 7L)
    assert(plain.tryWrite(None, l1), "initial write via plain path")
    assert(viaUri.read(0).contains(l1), "URI store reads the plain store's lease")
    // fenced CAS across the two spellings: viaUri bumps, plain's stale
    // expectation then fails — one shared fence, not two stores
    val l2 = l1.copy(owner = "owner-B", fence = 2L, continuation = 50L)
    assert(viaUri.tryWrite(Some(l1), l2), "CAS via URI store against plain store's state")
    assert(!plain.tryWrite(Some(l1), l1.copy(fence = 2L)),
      "plain store's stale (owner, fence) expectation must lose")
    assert(plain.read(0).contains(l2))
    assert(viaUri.readAll(N_RANGES).flatten.map(_.rangeId) == Vector(0))
  }

  test("interleaved CAS inside the read-compare-rename window degrades to at-least-once, never a lost checkpoint") {
    // The LeaseStore scaladoc documents the one caveat vs a true
    // conditional write: read-compare-rename is not atomic, so a
    // competing CAS can land INSIDE the window. This drives that
    // interleaving deterministically (the beforeRename seam — same
    // pattern as CheckpointStore.beforePublish, StreamingSpec) and
    // asserts the documented degradation instead of arguing it:
    //   - both CAS calls report success (the race is undetected AT the
    //     write — that is the caveat);
    //   - the file holds exactly ONE of the two complete records, no
    //     torn mix (rename atomicity);
    //   - the clobbered writer's NEXT CAS fails and the surviving
    //     writer's succeeds — the fence detects every lost race one
    //     step later, so ownership self-corrects;
    //   - the surviving continuation is one that was genuinely
    //     checkpointed: a REWIND (redelivery, at-least-once), never an
    //     invented position (skipped data).
    val dir = tmp("leases-interleave")
    val storeA = new LeaseStore(dir)
    val storeB = new LeaseStore(dir)
    val seed = LeaseState(0, "owner-A", 1L, 99999L, 10L)
    assert(storeA.tryWrite(None, seed))
    // B's competing CAS lands inside A's window: A has read fence 1 and
    // passed the compare; B then bumps to fence 2 / continuation 20
    val bWrite = seed.copy(owner = "owner-B", fence = 2L, continuation = 20L)
    var bLanded = false
    storeA.beforeRename = () => {
      storeA.beforeRename = () => ()
      assert(storeB.tryWrite(Some(seed), bWrite), "B's CAS inside A's window")
      bLanded = true
    }
    val aWrite = seed.copy(fence = 2L, continuation = 15L) // A checkpoints an earlier page
    assert(storeA.tryWrite(Some(seed), aWrite),
      "A's CAS also reports success — the undetected-at-write caveat")
    assert(bLanded)
    // exactly one complete record survives (A's rename overwrote B's)
    val cur = storeA.read(0).get
    assert(cur == aWrite, s"surviving record is A's complete write, got $cur")
    assert(cur.continuation == 15L,
      "continuation rewound to A's checkpointed page — redelivery, not a skip")
    // detection one step later: B's stale expectation fails, A's holds
    assert(!storeB.tryWrite(Some(bWrite), bWrite.copy(fence = 3L)),
      "clobbered writer's next CAS must lose")
    assert(storeA.tryWrite(Some(aWrite), aWrite.copy(fence = 3L, continuation = 25L)),
      "surviving writer's next CAS must win")
    assert(storeB.read(0).map(_.continuation).contains(25L))
    // the lease dir carries no CAS debris (nonce temps are cleaned or renamed)
    val leftover = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftover.isEmpty, s"no .tmp debris, got ${leftover.toList}")
  }

  test("a lost lease race at the PROCESSOR level redelivers, never skips — at-least-once end to end") {
    // The store-level interleaving spec proves the CAS's degradation;
    // this drives the same lost race through TWO ChangeFeedProcessors
    // and asserts the contract a consumer actually relies on: every
    // feed position is delivered at least once (duplicates allowed,
    // skips never), and ownership self-corrects within one poll.
    //
    // The race, forced deterministically: A owns the single range and
    // is inside its CHECKPOINT CAS (compare passed, rename pending —
    // the beforeRename seam); the clock jumps past A's TTL and B
    // acquires the expired lease, processes the SAME page, and
    // checkpoints. A's stale rename then lands, clobbering B's record
    // — the undetected-at-write lost race. B must drop the range on
    // its next poll (fence mismatch); A must retain it and drain the
    // feed with nothing skipped.
    val feedDir = tmp("feed-race")
    val feed = ChangeFeed.withRanges(
      Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
        .orderBy(col("event_id")).limit(90)
        .select(col("event_id").cast("long").as("pos"),
          col("user_id"), col("event_type")),
      "user_id", 1)
    feed.write.mode(SaveMode.Overwrite).partitionBy("range_id").parquet(feedDir)
    import spark.implicits._
    val all = spark.read.parquet(feedDir).select("pos").as[Long].collect().toSet

    val dir = tmp("leases-race")
    val storeA = new LeaseStore(dir)
    val storeB = new LeaseStore(dir)
    var now = 1000L
    val capA = new Capture(); val capB = new Capture()
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", 1,
      storeA, "grp", "instance-A", leaseTtlMs = 10000L, maxItems = 30,
      handler = capA.handler, clock = () => now)
    val b = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", 1,
      storeB, "grp", "instance-B", leaseTtlMs = 10000L, maxItems = 30,
      handler = capB.handler, clock = () => now)

    a.pollOnce() // acquire + page 1 + checkpoint
    val afterPage1 = capA.seen.toSet
    assert(afterPage1.nonEmpty && a.owned == Set(0))

    // arm the seam for A's NEXT checkpoint CAS: tryWrite #1 in the
    // coming pollOnce is the lease renewal, #2 the checkpoint —
    // ownedFences holds one range, so the order is fixed
    var calls = 0
    storeA.beforeRename = () => {
      calls += 1
      if (calls == 2) {
        storeA.beforeRename = () => ()
        now += 20000L // A's lease (TTL 10 s) is now expired
        b.pollOnce() // B acquires the expired lease, processes, checkpoints
        assert(b.owned == Set(0), "B acquired the expired range inside A's window")
        assert(capB.seen.nonEmpty, "B processed a page during the race")
      }
    }
    a.pollOnce() // page 2; its checkpoint rename lands AFTER B's, clobbering it
    assert(calls >= 2, "the race window fired")
    // the lost race: B's page duplicated work A also did (same
    // continuation) — redelivery is the degradation, loss would be
    // positions in neither capture
    assert(capB.seen.toSet.intersect(capA.seen.toSet).nonEmpty,
      "the race produced a genuine duplicate delivery")
    // the surviving record's continuation is a genuinely checkpointed
    // epoch, never an invented position — both writers checkpointed
    // the same page here, so the clobber regressed nothing
    val survived = storeA.read(0).get
    assert(capA.seen.contains(survived.continuation),
      s"surviving continuation ${survived.continuation} was actually processed")
    // ownership settles to exactly ONE instance within a poll each:
    // the loser's fence expectation fails against the survivor's
    // record (which spelling wins depends on whose expiry stamp
    // survived — the CONTRACT is single ownership plus no skips, not
    // a preferred winner)
    b.pollOnce(); a.pollOnce()
    assert((a.owned & b.owned).isEmpty && (a.owned | b.owned) == Set(0),
      s"exactly one instance owns the range after settling: A=${a.owned} B=${b.owned}")
    // drain with both instances live: every feed position is delivered
    // at least once — the race redelivered, it never skipped
    var rounds = 0
    while (totalGapN(feedDir, 1, storeA) > 0 && rounds < 40) {
      a.pollOnce(); b.pollOnce(); now += 100; rounds += 1
    }
    assert(capA.seen.toSet.union(capB.seen.toSet) == all,
      "the union of both instances' deliveries covers the whole feed — nothing skipped")
  }

  private def totalGapN(feedDir: String, nRanges: Int, leases: LeaseStore): Long = {
    import spark.implicits._
    ChangeFeedEstimator.lag(spark, feedDir, "range_id", "pos", nRanges, leases)
      .select("gap").as[Long].collect().sum
  }

  test("clock skew beyond the TTL: fast-clock peer steals mid-page; duplicates possible, skips never, single ownership") {
    // Both lost-race specs above drive ONE logical clock. Real
    // deployments have two hosts with skewed wall clocks — the classic
    // lease hazard: B's clock runs more than the TTL ahead of A's, so
    // B believes A's freshly-renewed lease is ALREADY EXPIRED while A
    // is mid-page (delivered, not yet checkpointed). The contract must
    // not change: the fenced CAS — not anyone's clock — arbitrates, so
    // the skewed steal degrades to duplicate delivery, never to a skip
    // or to split ownership. Two independent clock lambdas, fully
    // deterministic.
    val feedDir = tmp("feed-skew")
    val feed = ChangeFeed.withRanges(
      Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
        .orderBy(col("event_id")).limit(90)
        .select(col("event_id").cast("long").as("pos"),
          col("user_id"), col("event_type")),
      "user_id", 1)
    feed.write.mode(SaveMode.Overwrite).partitionBy("range_id").parquet(feedDir)
    import spark.implicits._
    val all = spark.read.parquet(feedDir).select("pos").as[Long].collect().toSet

    val dir = tmp("leases-skew")
    val storeA = new LeaseStore(dir)
    val storeB = new LeaseStore(dir)
    var nowA = 1000L
    val skewMs = 25000L // > TTL (10 s): B's view of A's lease is "expired"
    val seenA = collection.mutable.ArrayBuffer.empty[Long]
    val seenB = collection.mutable.ArrayBuffer.empty[Long]
    var aCheckpoints = false // A starts mid-page: delivered, unacked
    val a = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", 1,
      storeA, "grp", "instance-A", leaseTtlMs = 10000L, maxItems = 30,
      handler = (_, page, ck) => {
        seenA ++= page.select("pos").as[Long].collect()
        if (aCheckpoints) ck()
      },
      clock = () => nowA)
    val b = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", 1,
      storeB, "grp", "instance-B", leaseTtlMs = 10000L, maxItems = 30,
      handler = (_, page, ck) => { seenB ++= page.select("pos").as[Long].collect(); ck() },
      clock = () => nowA + skewMs)

    a.pollOnce() // A acquires, delivers page 1, does NOT checkpoint yet
    assert(a.owned == Set(0) && seenA.nonEmpty)
    assert(a.heldFence(0).isDefined, "A is mid-page and believes it owns")
    val leaseA = storeA.read(0).get
    assert(leaseA.expiresAtMs > nowA, "A's lease is live on A's clock")
    assert(leaseA.expiresAtMs <= nowA + skewMs, "…and already expired on B's")

    b.pollOnce() // B's clock says expired: steals, redelivers page 1, checkpoints
    assert(b.owned == Set(0), "B acquired on the strength of its skewed clock")
    assert(seenB.toSet.intersect(seenA.toSet).nonEmpty,
      "the skewed steal produced a genuine duplicate delivery (A never acked)")
    // B inherited A's continuation, not an invented one: its first page
    // is exactly the page A had in flight
    assert(seenB.toSet == seenA.toSet, "B resumed from the surviving continuation")

    aCheckpoints = true
    a.pollOnce() // A's renewal CAS fails — fence moved on; A drops silently
    assert(a.owned.isEmpty,
      "the CAS, not A's clock, told A it lost the range")
    assert(b.owned == Set(0), "single ownership after settling")
    // and A does not flap it back: on A's clock B's lease expires far in
    // the future, and B holds exactly its fair share — nothing to steal
    a.pollOnce()
    assert(a.owned.isEmpty && storeA.read(0).get.owner == "instance-B")

    // drain with both instances live and the skew held: nothing skipped
    var rounds = 0
    while (totalGapN(feedDir, 1, storeA) > 0 && rounds < 40) {
      a.pollOnce(); b.pollOnce(); nowA += 100; rounds += 1
    }
    assert(seenA.toSet.union(seenB.toSet) == all,
      "union of deliveries covers the whole feed — duplicates yes, skips never")
  }

  test("a failed CAS publish deletes its own nonce temp — no .tmp debris accumulates") {
    // The lease dir has no version GC (unlike CheckpointStore), so a
    // write/rename failure that leaked its nonce temp would accumulate
    // .lease-N-*.tmp files forever under repeated failures. Induce a
    // real rename failure: swap the destination for a NON-EMPTY
    // directory inside the CAS window (rename OVERWRITE onto a
    // non-empty dir throws on every Hadoop FS), and assert the temp is
    // cleaned before the rethrow.
    val dir = tmp("leases-cleanup")
    val store = new LeaseStore(dir)
    val seed = LeaseState(0, "owner-A", 1L, 99999L, 10L)
    assert(store.tryWrite(None, seed))
    store.beforeRename = () => {
      store.beforeRename = () => ()
      val dst = new java.io.File(dir, "lease-0")
      assert(dst.delete()); assert(dst.mkdir())
      val junk = new java.io.FileWriter(new java.io.File(dst, "junk"))
      junk.write("x"); junk.close()
    }
    intercept[java.io.IOException] {
      store.tryWrite(Some(seed), seed.copy(fence = 2L))
    }
    val leftover = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftover.isEmpty, s"failed publish must clean its temp, got ${leftover.toList}")
  }
}
