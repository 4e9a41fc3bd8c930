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
