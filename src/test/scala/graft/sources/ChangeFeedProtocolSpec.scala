package graft.sources

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-schedule protocol test for the lease-balanced change
  * feed: under arbitrary interleavings of instance joins, silent
  * deaths (renewals stop), polls, and clock advances, the protocol
  * must hold its safety invariants at EVERY step —
  *
  *  1. fenced exclusivity OF EFFECT: a victim of a steal still
  *     *believes* it owns the range until its next poll notices the
  *     fence moved — the same window the Cosmos SDK has between a
  *     steal and the old owner's failed renewal — but at most ONE
  *     live processor's claim can be VALID (its remembered fence
  *     matches the lease store), so a stale claimant's every write
  *     CAS fails;
  *  2. continuation monotonicity: a range's checkpointed continuation
  *     never decreases (a stale owner can never rewind a successor's
  *     checkpoint);
  *  3. at-least-once delivery: after the surviving instances drain,
  *     every feed position was handled at least once, and positions
  *     at or below a checkpointed continuation are never redelivered
  *     to a LATER poll of the same continuous ownership.
  *
  * Deterministic seeds; the clock is the schedule's, never the wall's.
  */
class ChangeFeedProtocolSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cfprotocol-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cfp-$tag").toString

  private val N_RANGES = 4

  test("random schedules of joins, deaths, polls, and clock advances preserve the protocol invariants") {
    import spark.implicits._
    val feedDir = tmp("feed")
    val all = {
      val feed = ChangeFeed.withRanges(
        Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
          .orderBy(col("event_id")).limit(60)
          .select(col("event_id").cast("long").as("pos"), col("user_id")),
        "user_id", N_RANGES)
      feed.write.mode(SaveMode.Overwrite).partitionBy("range_id").parquet(feedDir)
      spark.read.parquet(feedDir).select("pos").as[Long].collect().toSet
    }

    for (seed <- Seq(13, 29)) {
      val rnd = new scala.util.Random(seed)
      val leases = new LeaseStore(tmp(s"leases-$seed"))
      var now = 1000L
      val ttl = 5000L

      final case class Inst(name: String) {
        val seen = collection.mutable.ArrayBuffer.empty[Long]
        var alive = true
        val proc = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos",
          N_RANGES, leases, "grp", name, ttl, 10,
          (ctx, page, checkpoint) => {
            seen ++= page.select("pos").as[Long].collect()
            checkpoint()
          },
          () => now)
      }
      val instances = collection.mutable.ArrayBuffer(Inst("i0"))
      var lastCont = Map.empty[Int, Long].withDefaultValue(-1L)

      def checkInvariants(label: String): Unit = {
        // 1. fenced exclusivity of effect: at most one live claim per
        // range is VALID (remembered fence == stored fence, owner
        // matches) — stale post-steal beliefs are allowed, their CASes
        // all fail
        val valid = for {
          i <- instances.filter(_.alive)
          r <- i.proc.owned
          l <- leases.read(r)
          if l.owner == i.name && i.proc.heldFence(r).contains(l.fence)
        } yield r -> i.name
        val dup = valid.groupBy(_._1).filter(_._2.size > 1)
        assert(dup.isEmpty, s"[$seed/$label] two VALID claims on one range: $dup")
        // 2. continuation monotonicity
        for (r <- 0 until N_RANGES; l <- leases.read(r)) {
          assert(l.continuation >= lastCont(r),
            s"[$seed/$label] range $r continuation rewound: ${l.continuation} < ${lastCont(r)}")
          lastCont += r -> l.continuation
        }
      }

      for (step <- 0 until 18) {
        rnd.nextInt(10) match {
          case 0 if instances.size < 3 =>
            instances += Inst(s"i${instances.size}-$seed")
          case 1 if instances.count(_.alive) > 1 =>
            // silent death: renewals just stop (no graceful release)
            instances(rnd.nextInt(instances.size)).alive = false
          case 2 => now += ttl + 500 // TTL expiry window
          case _ =>
            val live = instances.filter(_.alive)
            if (live.nonEmpty) live(rnd.nextInt(live.size)).proc.pollOnce()
            now += 200
        }
        checkInvariants(s"step$step")
      }

      // drain with the survivors (ensure at least one)
      if (!instances.exists(_.alive)) instances.head.alive = true
      now += ttl + 500
      var rounds = 0
      def gap(): Long =
        ChangeFeedEstimator.lag(spark, feedDir, "range_id", "pos", N_RANGES, leases)
          .select("gap").as[Long].collect().sum
      while (gap() > 0 && rounds < 40) {
        instances.filter(_.alive).foreach(_.proc.pollOnce())
        now += 300; rounds += 1
        checkInvariants(s"drain$rounds")
      }
      assert(gap() == 0L, s"[$seed] failed to drain after $rounds rounds")
      // 3. at-least-once: the union of everything any instance handled
      // covers the whole feed
      val handled = instances.flatMap(_.seen).toSet
      assert(handled == all,
        s"[$seed] lost positions: ${(all -- handled).toSeq.sorted.take(5)}...")
    }
  }
}
