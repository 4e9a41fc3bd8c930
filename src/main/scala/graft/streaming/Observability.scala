package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Pipeline health/metrics surface (SURVEY §2.8): the reference's
  * Scheduling.Stats + Busy.Monitor + HealthCheckException re-expressed
  * over Spark's StreamingQueryListener progress events plus handler-side
  * busy bookkeeping.
  */
object Observability {

  /** Rolled-up query progress, the engine's own Scheduling.Stats
    * (Streams.fs:605-707 analogue). */
  final case class QueryStats(
      batches: Long = 0L,
      inputRows: Long = 0L,
      stateRows: Long = 0L,
      lastBatchDurationMs: Long = 0L,
      lastInputRowsPerSec: Double = 0.0)

  /** Attach to a SparkSession to accumulate per-query stats. */
  final class StatsListener extends StreamingQueryListener {
    private val stats = new TrieMap[java.util.UUID, QueryStats]

    def snapshot: Map[java.util.UUID, QueryStats] = stats.toMap

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      val prev = stats.getOrElse(p.id, QueryStats())
      stats(p.id) = QueryStats(
        batches = prev.batches + 1,
        inputRows = prev.inputRows + p.numInputRows,
        stateRows = Option(p.stateOperators).filter(_.nonEmpty)
          .map(_.map(_.numRowsTotal).sum).getOrElse(prev.stateRows),
        lastBatchDurationMs =
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L),
        lastInputRowsPerSec =
          if (p.inputRowsPerSecond.isNaN) 0.0 else p.inputRowsPerSecond)
    }
  }

  /** Per-(category, outcome) handler latency accumulator — the
    * reference's LatencyStats/LatencyStatsSet (Streams.fs:572-603):
    * counts, totals and log-2 bucket histograms, with percentile
    * estimates read from the bucket upper bounds. `instrument` wraps a
    * stream handler so every invocation records under
    * (stream category, ok|failed) with no engine changes. Driver-side
    * only: state is per-JVM and not Serializable, so it instruments
    * handlers that run in-process (local mode, tests, driver-side
    * foreachBatch loops). Handlers shipped to remote executors inside
    * (flatMapGroups/transform)WithState need SparkSession metrics or
    * accumulators instead — recordings in deserialized task-side copies
    * would be invisible to a driver snapshot(). Thread-safe within the
    * JVM.
    */
  final class LatencyStats(clockNanos: () => Long = () => System.nanoTime()) {

    final case class LatencySummary(
        count: Long, totalMs: Double, maxMs: Double,
        p50Ms: Double, p95Ms: Double, p99Ms: Double)

    // 64 log-2 buckets over microseconds; bucket upper bound = 2^(i+1)us
    private val buckets = new ConcurrentHashMap[String, Array[java.util.concurrent.atomic.AtomicLong]]
    private val totals = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
    private val maxes = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]

    def record(key: String, nanos: Long): Unit = {
      val us = math.max(1L, nanos / 1000)
      val idx = math.min(63, 63 - java.lang.Long.numberOfLeadingZeros(us))
      buckets.computeIfAbsent(key,
        _ => Array.fill(64)(new java.util.concurrent.atomic.AtomicLong))(idx)
        .incrementAndGet()
      totals.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong)
        .addAndGet(us)
      maxes.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong)
        .accumulateAndGet(us, (a, b) => math.max(a, b))
    }

    def snapshot(key: String): Option[LatencySummary] =
      Option(buckets.get(key)).map { bs =>
        val counts = bs.map(_.get())
        val n = counts.sum
        def pct(p: Double): Double = {
          val target = math.ceil(n * p).toLong
          var acc = 0L
          var i = 0
          while (i < 64 && acc < target) { acc += counts(i); i += 1 }
          math.pow(2.0, i.toDouble) / 1000.0 // bucket upper bound, ms
        }
        LatencySummary(n, totals.get(key).get() / 1000.0,
          maxes.get(key).get() / 1000.0, pct(0.5), pct(0.95), pct(0.99))
      }

    def keys: Seq[String] = buckets.keySet.asScala.toSeq.sorted

    /** Wrap a handler: every invocation records under
      * "{category}/{ok|failed}"; failures re-throw unchanged. */
    def instrument[A](
        handle: (String, Seq[InputEvent]) => A): (String, Seq[InputEvent]) => A =
      (stream, evs) => {
        val t0 = clockNanos()
        val category = stream.split("-", 2)(0)
        try {
          val r = handle(stream, evs)
          record(s"$category/ok", clockNanos() - t0)
          r
        } catch {
          case e: Throwable =>
            record(s"$category/failed", clockNanos() - t0)
            throw e
        }
      }
  }

  sealed trait StreamHealth
  case object Running extends StreamHealth
  final case class Failing(attempts: Int, firstFailureMs: Long) extends StreamHealth
  final case class Stuck(sinceMs: Long) extends StreamHealth

  /** Raised when a stream exceeds the abend threshold
    * (Streams.fs:311-322, 697-707; SinkHealthTests.fs). */
  final class HealthCheckException(
      val stuckStreams: Seq[(String, Long)],
      val failingStreams: Seq[(String, Int)])
      extends RuntimeException(
        s"stuck=${stuckStreams.map(_._1).mkString(",")} " +
          s"failing=${failingStreams.map(_._1).mkString(",")}")

  /** Per-stream busy/failure classification (Busy.Monitor,
    * Streams.fs:438-532). Handlers report outcomes; a watchdog asks for
    * a verdict against the abend threshold. Thread-safe: handlers run on
    * executor threads in local mode, the watchdog on the driver. */
  final class BusyMonitor(clockMs: () => Long = () => System.currentTimeMillis()) {
    private val firstFailure = new ConcurrentHashMap[String, Long]
    private val attempts = new ConcurrentHashMap[String, Integer]
    private val noProgressSince = new ConcurrentHashMap[String, Long]

    def recordSuccess(stream: String): Unit = {
      firstFailure.remove(stream); attempts.remove(stream)
      noProgressSince.remove(stream)
    }

    def recordFailure(stream: String): Unit = {
      firstFailure.putIfAbsent(stream, clockMs())
      attempts.merge(stream, 1, (a, b) => a + b)
    }

    /** Handler completed without advancing the write position. */
    def recordNoProgress(stream: String): Unit =
      noProgressSince.putIfAbsent(stream, clockMs())

    def classify(stream: String): StreamHealth =
      Option(firstFailure.get(stream))
        .map(t => Failing(attempts.getOrDefault(stream, 0), t): StreamHealth)
        .orElse(Option(noProgressSince.get(stream)).map(t => Stuck(t): StreamHealth))
        .getOrElse(Running)

    /** Throw if any stream has been stuck/failing longer than
      * `abendAfterMs` (the reference's abendThreshold watchdog). */
    def healthCheck(abendAfterMs: Long): Unit = {
      val now = clockMs()
      val stuck = noProgressSince.asScala.toSeq.collect {
        case (s, t) if now - t >= abendAfterMs => (s, now - t)
      }
      val failing = firstFailure.asScala.toSeq.collect {
        case (s, t) if now - t >= abendAfterMs => (s, attempts.getOrDefault(s, 0).toInt)
      }
      if (stuck.nonEmpty || failing.nonEmpty)
        throw new HealthCheckException(stuck, failing)
    }
  }
}
