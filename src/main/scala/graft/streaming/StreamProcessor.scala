package graft.streaming

import graft.core.{HandlerProgress, SpanAlgebra}
import graft.core.SpanAlgebra.{Ev, Span}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering the stream processor (the engine's StreamEvent:
  * reference src/Propulsion/Sinks.fs:33). */
final case class InputEvent(
    streamName: String,
    index: Long,
    eventType: String,
    data: String,
    size: Long,
    isUnfold: Boolean)

/** What the handler produced for one dispatched span. A `failed` row is
  * the dead-letter record of the span that poisoned the stream: after
  * emitting it, the stream is quarantined (malformed) and dispatches
  * nothing further (reference malformed classification,
  * Streams.fs:165-178, 338-341). */
final case class ProcessedSpan[A](
    streamName: String,
    fromIndex: Long,
    toIndex: Long,
    nEvents: Int,
    result: A,
    failed: Boolean = false,
    error: String = "",
    handledUnfolds: Int = 0,
    revision: Long = SpanAlgebra.RevisionInitial)

/** Persisted per-stream buffer between micro-batches. `revision` counts
  * queue unfold-set changes (Streams.fs:183), surviving the state-store
  * round-trip so a snapshot refresh in a later micro-batch is
  * detectable at an unchanged write position. */
final case class BufferState(
    writePos: Long,
    queue: Seq[Seq[InputEvent]],
    malformed: Boolean,
    revision: Long = SpanAlgebra.RevisionInitial)

/** The per-stream handler engine: the Spark-native form of the
  * reference's Scheduler/Dispatcher/Sink pipeline (SURVEY §2.3–2.5).
  *
  * `groupByKey(streamName) + flatMapGroupsWithState` gives, for free,
  * exactly the contracts the reference builds by hand:
  *   - ≤1 in-flight handler invocation per stream (per-key serialization);
  *   - state (write position + buffered spans) carried across batches in
  *     the state store, checkpointed with the offsets;
  *   - micro-batch commit = batch-ordered progress (Streams.fs:709-750).
  *
  * On top, this class adds the span algebra the state store can't know:
  * write-position dedupe of redeliveries, island coalescing, gap
  * hold-back (`requireAll`), malformed-stream quarantine, and state
  * purge via processing-time timeout (purgeInterval, Streams.fs:904-927).
  *
  * Scale: state is per-stream and O(buffered gap), not O(history); the
  * shuffle is one hash exchange on streamName, the same partitioning
  * every downstream stateful op reuses. Hot streams serialize by design
  * (per-stream ordering) — throughput comes from stream cardinality,
  * exactly like the reference (DOCUMENTATION.md:165-186).
  */
object StreamProcessor {

  private def toEv(e: InputEvent): Ev = Ev(e.index, e.eventType, e.size, e.isUnfold)

  /** Run `handle` over every dispatchable span.
    *
    * @param handle     stream handler `(streamName, events) => A`; events
    *                   arrive index-ordered, deduped, starting at/after
    *                   the stream's write position
    * @param requireAll hold gapped streams until contiguous from the
    *                   write position (Streams.fs:828-867)
    * @param purgeAfterMs drop empty stream states after this idle time
    *                   (0 = never)
    */
  def process[A](
      events: Dataset[InputEvent],
      handle: (String, Seq[InputEvent]) => A,
      requireAll: Boolean = false,
      purgeAfterMs: Long = 0L)(
      implicit outEnc: Encoder[ProcessedSpan[A]]): Dataset[ProcessedSpan[A]] = {
    implicit val stateEnc: Encoder[BufferState] = Encoders.product[BufferState]
    val timeout =
      if (purgeAfterMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    import events.sparkSession.implicits._
    events
      .groupByKey(_.streamName)
      .flatMapGroupsWithState[BufferState, ProcessedSpan[A]](
        OutputMode.Append(), timeout) { (stream, incoming, state) =>
        if (state.hasTimedOut) {
          // purgeInterval: jettison idle (empty) stream state
          if (state.getOption.forall(_.queue.isEmpty)) state.remove()
          Iterator.empty
        } else {
          val prev = state.getOption.getOrElse(BufferState(0L, Nil, malformed = false))
          val out = step(stream, incoming.toVector, prev, handle, requireAll) match {
            case (next, emitted) =>
              if (next.queue.isEmpty && next.writePos == 0L && !next.malformed) state.remove()
              else state.update(next)
              if (purgeAfterMs > 0) state.setTimeoutDuration(purgeAfterMs)
              emitted
          }
          out.iterator
        }
      }
  }

  /** One micro-batch step for one stream — pure, unit-testable.
    *
    * A handler exception quarantines the stream: a dead-letter
    * ProcessedSpan(failed=true) is emitted for the poisoned span, the
    * state is marked malformed, and nothing further dispatches (the
    * write position does NOT advance past the failure, so a redeploy
    * with a fixed handler resumes exactly there).
    *
    * Unfold flow (reference Streams.fs:342-346): a successful dispatch
    * yields HandlerProgress (pos, revision-if-unfolds-handled); progress
    * is recorded, then [[SpanAlgebra.StreamState.tryTrimUnfolds]] strips
    * the handled unfold set — but only if neither the position nor the
    * revision moved meanwhile. A snapshot redelivered in a later batch
    * at the same write position bumps the revision on ingest and is
    * re-dispatched.
    */
  def step[A](
      stream: String,
      incoming: Vector[InputEvent],
      prev: BufferState,
      handle: (String, Seq[InputEvent]) => A,
      requireAll: Boolean): (BufferState, Vector[ProcessedSpan[A]]) = {
    if (prev.malformed) (prev, Vector.empty)
    else {
      // payload identity is (index, type, isUnfold): unfolds share an
      // index with each other and with the event at that position
      def key(e: InputEvent) = (e.index, e.eventType, e.isUnfold)
      val byKey = incoming.map(e => key(e) -> e).toMap
      val prevEvs: Vector[Span] = prev.queue.toVector.map(_.toVector.map(toEv))
      // seed from the persisted state, then ingest this batch's span:
      // write-pos dedupe + canonical merge + revision bump when the
      // queue's tail unfold set changes (Streams.fs:183)
      var st = SpanAlgebra.StreamState(
        prev.writePos, SpanAlgebra.merge(prevEvs), malformed = false, prev.revision)
        .ingest(incoming.sortBy(_.index).map(toEv))
      // keep full payloads alongside the algebra's canonical shape
      val prevByKey = prev.queue.flatten.map(e => key(e) -> e).toMap
      def payload(ev: Ev): InputEvent = {
        val k = (ev.index, ev.eventType, ev.isUnfold)
        prevByKey.getOrElse(k,
          byKey.getOrElse(k,
            InputEvent(stream, ev.index, ev.eventType, "", ev.size, ev.isUnfold)))
      }

      var malformed = false
      val emitted = Vector.newBuilder[ProcessedSpan[A]]
      var continue = true
      while (continue && st.queue.nonEmpty) {
        st.tryDispatch(requireAll) match {
          case None => continue = false
          case Some(head) =>
            val evs = head.map(payload)
            scala.util.Try(handle(stream, evs)) match {
              case scala.util.Success(res) =>
                val hp = HandlerProgress.ofUnfoldsAndPos(
                  st.revision, head.count(_.isUnfold), SpanAlgebra.nextIndex(head))
                emitted += ProcessedSpan(stream, head.head.index, head.last.index,
                  evs.size, res,
                  handledUnfolds = head.count(_.isUnfold), revision = hp.revision)
                st = st.recordProgress(hp.pos)
                // handled unfolds linger at the write position until
                // trimmed (their index IS the write position); the trim
                // bumps the revision so stale HandlerProgress can't
                // satisfy a later requirement
                st.tryTrimUnfolds(hp.pos, hp.revision).foreach(t => st = t)
              case scala.util.Failure(e) =>
                emitted += ProcessedSpan(stream, head.head.index, head.last.index,
                  evs.size, null.asInstanceOf[A], failed = true,
                  error = String.valueOf(e.getMessage))
                malformed = true
                continue = false
            }
        }
      }
      (BufferState(st.writePos, st.queue.map(_.map(payload)), malformed, st.revision),
        emitted.result())
    }
  }
}
