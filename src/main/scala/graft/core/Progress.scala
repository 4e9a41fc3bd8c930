package graft.core

import scala.collection.mutable

/** Handler completion report: the attained write position plus the queue
  * revision whose unfold set the handler consumed (RevisionInitial when
  * the dispatched span carried no unfolds) — reference
  * src/Propulsion/Streams.fs:160-163 `Buffer.HandlerProgress`. */
final case class HandlerProgress(pos: Long, revision: Long)

object HandlerProgress {
  def ofPos(pos: Long): HandlerProgress =
    HandlerProgress(pos, SpanAlgebra.RevisionInitial)

  /** Carry the revision only when the handler actually consumed unfolds
    * (Streams.fs:163 `ofMetricsAndPos`: `if us <> 0`). */
  def ofUnfoldsAndPos(revision: Long, handledUnfolds: Int, pos: Long): HandlerProgress =
    if (handledUnfolds != 0) HandlerProgress(pos, revision) else ofPos(pos)
}

/** What a batch requires of one stream before it may checkpoint: attain
  * `pos`, and — when the queue tail carried an unfold set at that
  * position — have a handler consume unfolds at `revision` or later.
  * The revision arm is what makes a snapshot refresh at an UNCHANGED
  * write position re-block the checkpoint until re-handled (reference
  * Streams.fs:192-206 `ProgressRequirement`). */
final case class ProgressRequirement(pos: Long, revision: Option[Long])

object ProgressRequirement {
  def ofPos(pos: Long): ProgressRequirement = ProgressRequirement(pos, None)

  def ofPosUnfoldRevision(pos: Long, rev: Long): ProgressRequirement =
    ProgressRequirement(pos, Some(rev))

  /** Truth table straight from Streams.fs:198-203: moving past the
    * position always satisfies; landing exactly on it satisfies a bare
    * position, and satisfies a revision-gated one only if the handled
    * revision is current-or-later. */
  def isSatisfiedBy(hp: HandlerProgress)(req: ProgressRequirement): Boolean =
    req match {
      case ProgressRequirement(p, _) if hp.pos > p => true
      case ProgressRequirement(p, None) => hp.pos == p
      case ProgressRequirement(p, Some(r)) if hp.pos == p => hp.revision >= r
      case _ => false
    }

  /** The requirement a batch records for a stream needing `index`
    * attained (Streams.fs:204-206 `compute`): none if already handled;
    * revision-gated if the batch delivered an unfold and the queue tail
    * still carries an unfold set at `index`; else bare position. */
  def compute(index: Long, hadUnfold: Boolean,
      st: SpanAlgebra.StreamState): Option[ProgressRequirement] =
    if (st.isEmpty || st.writePos > index) None
    else if (hadUnfold && st.tailHasUnfoldAt(index)) Some(ofPosUnfoldRevision(index, st.revision))
    else Some(ofPos(index))
}

/** Batch-ordered progress lattice (reference semantics:
  * src/Propulsion/Streams.fs:709-750 + tests/ProgressTests.fs:16-54):
  *
  *  - a batch carries per-stream required positions (optionally
  *    revision-gated when the batch delivered unfolds);
  *  - a batch completes (its checkpoint callback fires) only when every
  *    requirement is attained;
  *  - batches complete strictly in submission order — a later batch
  *    whose requirements are met must wait for earlier ones;
  *  - empty batches complete immediately (subject to ordering);
  *  - requirements don't persist across batches.
  *
  * This is the same contract Structured Streaming's commit log gives a
  * micro-batch (offset N commits only after batch N succeeds); the class
  * exists for the custom-source path and for parity tests.
  */
final class ProgressState[S] {

  private final case class Batch(reqs: mutable.Map[S, ProgressRequirement], onComplete: () => Unit)

  private val batches = mutable.Queue.empty[Batch]

  def appendBatch(reqs: Map[S, ProgressRequirement], onComplete: () => Unit): Unit = {
    batches.enqueue(Batch(mutable.Map.from(reqs), onComplete))
    drainCompleted()
  }

  /** Position-only convenience (the pre-revision surface). */
  def appendBatchPos(reqs: Map[S, Long], onComplete: () => Unit): Unit =
    appendBatch(reqs.map { case (s, p) => s -> ProgressRequirement.ofPos(p) }, onComplete)

  /** A handler for `stream` completed at `hp` (reference
    * `RemoveAttainedRequirements`, Streams.fs:731-736). */
  def markAttained(stream: S, hp: HandlerProgress): Unit = {
    batches.foreach { b =>
      b.reqs.get(stream) match {
        case Some(req) if ProgressRequirement.isSatisfiedBy(hp)(req) => b.reqs.remove(stream)
        case _ => ()
      }
    }
    drainCompleted()
  }

  /** A handler for `stream` reached `pos` (its next write position). */
  def markAttained(stream: S, pos: Long): Unit =
    markAttained(stream, HandlerProgress.ofPos(pos))

  /** Positions still required, lowest requirement per stream (what must
    * be scheduled next). */
  def pendingRequirements: Map[S, Long] =
    batches.iterator.flatMap(_.reqs).map { case (s, r) => (s, r.pos) }.toList
      .groupMapReduce(_._1)(_._2)(math.min)

  def inFlightBatches: Int = batches.size

  private def drainCompleted(): Unit = {
    while (batches.headOption.exists(_.reqs.isEmpty))
      batches.dequeue().onComplete()
  }
}
