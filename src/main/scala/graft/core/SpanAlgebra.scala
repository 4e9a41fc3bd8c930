package graft.core

/** Pure span algebra: the per-stream buffering/merge/dedupe semantics at
  * the heart of the reference engine, re-derived from its documented
  * invariants (jet/propulsion src/Propulsion/Streams.fs:81-147 and the
  * property suite tests/Propulsion.Tests/StreamStateTests.fs:112-176):
  *
  *  - merged spans are ordered, non-empty, with a gap >= 1 between them
  *  - no duplicate indexes survive (write-position dedupe)
  *  - unfolds (snapshot rows) appear only at the tail, one per event
  *    type, only the freshest set retained, never behind the events
  *
  * Pure functions over immutable vectors so the same code drives the
  * batch window expressions' tests and the streaming state store.
  */
object SpanAlgebra {

  /** One event in a stream span. `index` is the 0-based contiguous
    * per-stream position; `isUnfold` marks snapshot rows that accompany
    * a position rather than occupy one. */
  final case class Ev(index: Long, eventType: String, size: Long, isUnfold: Boolean)

  object Ev {
    def e(index: Long, eventType: String = "e", size: Long = 1): Ev =
      Ev(index, eventType, size, isUnfold = false)
    def u(index: Long, eventType: String = "u", size: Long = 1): Ev =
      Ev(index, eventType, size, isUnfold = true)
  }

  /** A span: a contiguous run of events, optionally followed by an
    * unfold suffix at/after the last event index. */
  type Span = Vector[Ev]

  def spanIndex(s: Span): Long = s.head.index

  /** Next expected index after a span's events (unfolds don't advance). */
  def nextIndex(s: Span): Long =
    s.filterNot(_.isUnfold).lastOption.map(_.index + 1)
      .getOrElse(s.headOption.map(_.index).getOrElse(0L))

  /** Merge an arbitrary bag of (possibly overlapping, gapped,
    * duplicate-bearing) spans into canonical form. */
  def merge(spans: Seq[Span]): Vector[Span] = {
    val flat = spans.toVector.flatten
    val events = {
      val seen = scala.collection.mutable.LongMap.empty[Ev]
      flat.foreach(ev => if (!ev.isUnfold && !seen.contains(ev.index)) seen(ev.index) = ev)
      seen.values.toVector.sortBy(_.index)
    }
    val islands: Vector[Vector[Ev]] =
      if (events.isEmpty) Vector.empty
      else events.drop(1).foldLeft(Vector(Vector(events.head))) { (acc, ev) =>
        if (ev.index == acc.last.last.index + 1) acc.init :+ (acc.last :+ ev)
        else acc :+ Vector(ev)
      }
    val lastEventIdx = events.lastOption.map(_.index)
    val unfolds = {
      val us = flat.filter(_.isUnfold)
      if (us.isEmpty) Vector.empty[Ev]
      else {
        val freshestIdx = us.map(_.index).max
        // stale snapshots (behind the event tail) are dropped entirely
        if (lastEventIdx.exists(freshestIdx < _)) Vector.empty[Ev]
        else {
          // freshest set only; one per event type, last delivery wins
          val set = us.filter(_.index == freshestIdx)
          set.reverse.distinctBy(_.eventType).reverse
        }
      }
    }
    if (unfolds.isEmpty) islands
    else if (islands.isEmpty) Vector(unfolds)
    else {
      val last = islands.last
      // unfolds ride on the last span when adjacent, else form the tail span
      if (unfolds.head.index <= last.last.index + 1) islands.init :+ (last ++ unfolds)
      else islands :+ unfolds
    }
  }

  /** Write-position dedupe: drop events below `pos` (already processed);
    * unfolds survive only at/after `pos`
    * (Streams.fs:111-117; DOCUMENTATION.md:402-433). */
  def dropBefore(pos: Long)(spans: Vector[Span]): Vector[Span] =
    merge(spans.map(_.filter(ev => ev.index >= pos)))

  /** Bound one dispatch to maxEvents/maxBytes: always >= 1 item, and the
    * unfold suffix is atomic — included whole or not at all. When every
    * event fits the budget, the unfold suffix ships unconditionally
    * (budget-exempt): the reference's trimEvents/slice never separates a
    * complete span from its snapshots (Streams.fs:89-107). */
  def slice(maxEvents: Int, maxBytes: Long)(span: Span): Span = {
    val (events, unfolds) = span.span(!_.isUnfold)
    var taken = 0
    var bytes = 0L
    val kept = events.takeWhile { ev =>
      val ok = taken == 0 || (taken < maxEvents && bytes + ev.size <= maxBytes)
      if (ok) { taken += 1; bytes += ev.size }
      ok
    }
    if (kept.sizeIs < events.size) kept // cut mid-events: unfolds can't ride
    else kept ++ unfolds // all events fit: unfolds ride, budget-exempt
  }

  /** Gap test for requireAll mode (Streams.fs:828-867): dispatchable only
    * if buffered contiguously from the write position. */
  def queuedIsAtWritePos(spans: Vector[Span], writePos: Long): Boolean =
    spans.headOption.exists(s => spanIndex(s) <= writePos)

  /** Revision counter start value (Streams.fs:155-158: Revision.initial
    * = -1, incremented on every queue unfold-set change). */
  val RevisionInitial: Long = -1L

  /** The unfold suffix of the canonical queue's tail span. */
  def tailUnfolds(queue: Vector[Span]): Vector[Ev] =
    queue.lastOption.map(_.filter(_.isUnfold)).getOrElse(Vector.empty)

  /** Drop every unfold from the queue (StreamSpan.stripUnfolds). */
  def stripUnfolds(queue: Vector[Span]): Vector[Span] =
    queue.map(_.filterNot(_.isUnfold)).filter(_.nonEmpty)

  /** Did an ingest/combine change the queue's unfold set? Mirrors the
    * reference's physical-equality test (Streams.fs:219-226): the set
    * appearing or vanishing is a change, and a delivery that WINS the
    * tail slot is a change even when its payload is value-identical —
    * the reference compares object identity, where a redelivered
    * snapshot is always a fresh object. */
  private[core] def unfoldsChanged(
      oldTail: Vector[Ev], newTail: Vector[Ev], incoming: Seq[Ev]): Boolean =
    (oldTail.isEmpty, newTail.isEmpty) match {
      case (true, true) => false
      case (true, false) | (false, true) => true
      case (false, false) =>
        oldTail != newTail ||
          incoming.exists(e => e.isUnfold && e.index == newTail.head.index)
    }

  /** Per-stream buffer state (Streams.fs:165-228 condensed): write
    * position + canonical span queue + malformed flag + unfold revision
    * (Streams.fs:183: count of queue unfold-set changes, so a snapshot
    * refresh at an unchanged write position is detectable). */
  final case class StreamState(
      writePos: Long = 0L,
      queue: Vector[Span] = Vector.empty,
      malformed: Boolean = false,
      revision: Long = RevisionInitial) {

    def ingest(span: Span): StreamState = {
      val next = dropBefore(writePos)(queue :+ span)
      val rev =
        if (unfoldsChanged(tailUnfolds(queue), tailUnfolds(next), span)) revision + 1
        else revision
      copy(queue = next, revision = rev)
    }

    /** Handler progressed to `pos`: advance + trim. */
    def recordProgress(pos: Long): StreamState = {
      val wp = math.max(writePos, pos)
      copy(writePos = wp, queue = dropBefore(wp)(queue))
    }

    /** Does the queue tail carry an unfold set at `index`? The signal
      * that a checkpoint at `index` must also require the current
      * revision. Mirrors the reference exactly (Streams.fs:184-187
      * `TailHasUnfoldAtIndex`): test the last ELEMENT of the tail span —
      * equivalent to testing the last unfold only because merge
      * guarantees unfolds are a strict suffix of the tail span, an
      * invariant SpanAlgebraSpec pins. */
    def tailHasUnfoldAt(index: Long): Boolean =
      queue.lastOption.flatMap(_.lastOption)
        .exists(e => e.isUnfold && e.index == index)

    /** Handler completed at (pos, revision): strip the handled unfolds
      * and bump the revision — but only if BOTH still match, i.e. no
      * fresher events or snapshot landed while the handler ran
      * (StreamState.tryTrimUnfoldsIffPosAndRevisionStill,
      * Streams.fs:229-231). */
    def tryTrimUnfolds(pos: Long, rev: Long): Option[StreamState] =
      if (writePos != pos || revision != rev) None
      else Some(copy(queue = stripUnfolds(queue), revision = revision + 1))

    /** The next dispatchable span, honoring requireAll gap-guarding. */
    def tryDispatch(requireAll: Boolean): Option[Span] =
      if (malformed) None
      else queue.headOption.filter(_ => !requireAll || queuedIsAtWritePos(queue, writePos))

    def isEmpty: Boolean = queue.isEmpty
  }

  /** Merge two buffer states (StreamState.combine, Streams.fs:208-228):
    * max write pos, queue union re-merged, malformed is sticky, and the
    * revision derives from `a`'s (the resident state), incremented when
    * the merged queue's unfold set differs from `a`'s. */
  def combine(a: StreamState, b: StreamState): StreamState = {
    val wp = math.max(a.writePos, b.writePos)
    val q = dropBefore(wp)(a.queue ++ b.queue)
    val rev =
      if (unfoldsChanged(tailUnfolds(a.queue), tailUnfolds(q), b.queue.flatten)) a.revision + 1
      else a.revision
    StreamState(wp, q, a.malformed || b.malformed, rev)
  }
}
