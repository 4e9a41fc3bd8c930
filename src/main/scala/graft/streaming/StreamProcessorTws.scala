package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The per-stream handler engine on Spark's arbitrary-state v2 API
  * (`transformWithState`, the successor of `flatMapGroupsWithState` —
  * SURVEY §2.3/2.5 maps the reference's StreamState buffer to exactly
  * this state store). Semantics are [[StreamProcessor.step]] verbatim:
  * both engines share the one pure per-batch transition function, so
  * write-pos dedupe, island coalescing, requireAll gap-guarding and
  * malformed quarantine are bit-identical across the two APIs (asserted
  * by the parity test in StreamingSpec).
  *
  * What the v2 API adds over flatMapGroupsWithState:
  *  - typed, named state slots ([[ValueState]]) with native TTL — the
  *    reference's purgeInterval (Streams.fs:904-927) becomes a
  *    declarative `TTLConfig` instead of hand-rolled timeout wrangling;
  *  - RocksDB-backed state with changelog checkpointing — the 100 TB
  *    path, where per-stream state must spill off-heap and restore
  *    incrementally on failover;
  *  - state-schema evolution: with
  *    `spark.sql.streaming.stateStore.encodingFormat=avro` set when
  *    the checkpoint is FIRST written, a field can be ADDED to
  *    [[BufferState]] across a restart (declare it `Option[...]` so
  *    avro has a null default for rows written by the old schema;
  *    never remove or retype fields). Proven by the StreamingSpec
  *    evolution case on RocksDB changelog checkpoints.
  */
class SpanStatefulProcessor[A](
    handle: (String, Seq[InputEvent]) => A,
    requireAll: Boolean,
    ttl: TTLConfig)
  extends StatefulProcessor[String, InputEvent, ProcessedSpan[A]] {

  @transient private var buffer: ValueState[BufferState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buffer = getHandle.getValueState[BufferState](
      "buffer", Encoders.product[BufferState], ttl)

  override def handleInputRows(
      key: String,
      rows: Iterator[InputEvent],
      timerValues: TimerValues): Iterator[ProcessedSpan[A]] = {
    val prev =
      if (buffer.exists()) buffer.get()
      else BufferState(0L, Nil, malformed = false)
    val (next, emitted) =
      StreamProcessor.step(key, rows.toVector, prev, handle, requireAll)
    if (next.queue.isEmpty && next.writePos == 0L && !next.malformed) buffer.clear()
    else buffer.update(next)
    emitted.iterator
  }
}

object StreamProcessorTws {

  /** [[StreamProcessor.process]] on the transformWithState engine.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). A non-NONE `ttl`
    * purges idle stream state declaratively (needs processing-time
    * mode, which this enables automatically). Caveat: in processing-time
    * mode the trigger clock keeps scheduling batches, so deterministic
    * test waits (`processAllAvailable`) do not settle — use TTL only in
    * continuously-running production queries; tests and AvailableNow
    * drains should pass TTLConfig.NONE (or use [[StreamProcessor]]'s
    * timeout-based purge). */
  def process[A](
      events: Dataset[InputEvent],
      handle: (String, Seq[InputEvent]) => A,
      requireAll: Boolean = false,
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit outEnc: Encoder[ProcessedSpan[A]]): Dataset[ProcessedSpan[A]] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.streamName)
      .transformWithState(
        new SpanStatefulProcessor[A](handle, requireAll, ttl),
        timeMode, OutputMode.Append())
  }
}
