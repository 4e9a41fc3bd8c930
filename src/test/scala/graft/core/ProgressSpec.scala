package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the progress/batch-completion lattice tests
  * (tests/Propulsion.Tests/ProgressTests.fs:16-54 — re-stated). */
class ProgressSpec extends AnyFunSuite {

  private def tracker(): (ProgressState[String], collection.mutable.Buffer[Int]) = {
    val fired = collection.mutable.Buffer.empty[Int]
    (new ProgressState[String], fired)
  }

  test("empty batches complete immediately") {
    val (p, fired) = tracker()
    p.appendBatchPos(Map.empty, () => fired += 1)
    assert(fired.toList == List(1))
    assert(p.inFlightBatches == 0)
  }

  test("batch completes only when all stream requirements are attained") {
    val (p, fired) = tracker()
    p.appendBatchPos(Map("a" -> 2L, "b" -> 3L), () => fired += 1)
    p.markAttained("a", 2L)
    assert(fired.isEmpty)
    p.markAttained("b", 2L) // not enough
    assert(fired.isEmpty)
    p.markAttained("b", 3L)
    assert(fired.toList == List(1))
  }

  test("completion is strictly batch-ordered") {
    val (p, fired) = tracker()
    p.appendBatchPos(Map("a" -> 2L), () => fired += 1)
    p.appendBatchPos(Map("b" -> 1L), () => fired += 2)
    p.markAttained("b", 5L) // batch 2 satisfied but batch 1 still open
    assert(fired.isEmpty)
    p.markAttained("a", 2L)
    assert(fired.toList == List(1, 2))
  }

  test("a later empty batch waits for earlier incomplete ones") {
    val (p, fired) = tracker()
    p.appendBatchPos(Map("a" -> 1L), () => fired += 1)
    p.appendBatchPos(Map.empty, () => fired += 2)
    assert(fired.isEmpty)
    p.markAttained("a", 9L)
    assert(fired.toList == List(1, 2))
  }

  test("requirements do not persist across batches") {
    val (p, fired) = tracker()
    p.appendBatchPos(Map("a" -> 1L), () => fired += 1)
    p.markAttained("a", 1L)
    assert(fired.toList == List(1))
    // a new batch requiring a position already passed still needs a fresh mark
    p.appendBatchPos(Map("a" -> 1L), () => fired += 2)
    assert(fired.toList == List(1))
    p.markAttained("a", 1L)
    assert(fired.toList == List(1, 2))
  }

  test("pendingRequirements reports the minimum required position per stream") {
    val (p, _) = tracker()
    p.appendBatchPos(Map("a" -> 5L, "b" -> 2L), () => ())
    p.appendBatchPos(Map("a" -> 3L), () => ())
    assert(p.pendingRequirements == Map("a" -> 3L, "b" -> 2L))
  }

  // --- Revision-gated requirements (reference Streams.fs:192-206) ---

  test("isSatisfiedBy: the Streams.fs:198-203 truth table") {
    import ProgressRequirement._
    val bare = ofPos(3L)
    val gated = ofPosUnfoldRevision(3L, 2L)
    // moving past the position always satisfies, revision-gated or not
    assert(isSatisfiedBy(HandlerProgress.ofPos(4))(bare))
    assert(isSatisfiedBy(HandlerProgress.ofPos(4))(gated))
    // landing exactly on it satisfies a bare position requirement
    assert(isSatisfiedBy(HandlerProgress.ofPos(3))(bare))
    // ... but a revision-gated one needs the handled revision current-or-later
    assert(!isSatisfiedBy(HandlerProgress.ofPos(3))(gated))
    assert(!isSatisfiedBy(HandlerProgress(3, 1))(gated))
    assert(isSatisfiedBy(HandlerProgress(3, 2))(gated))
    assert(isSatisfiedBy(HandlerProgress(3, 5))(gated))
    // short of the position never satisfies
    assert(!isSatisfiedBy(HandlerProgress(2, 99))(bare))
    assert(!isSatisfiedBy(HandlerProgress(2, 99))(gated))
  }

  test("compute: requirement shape follows the queue state (Streams.fs:204-206)") {
    import SpanAlgebra._
    // empty queue: already handled, no requirement
    assert(ProgressRequirement.compute(3, hadUnfold = true, StreamState(writePos = 3)).isEmpty)
    // write position beyond the index: no requirement
    val past = StreamState(writePos = 5, queue = Vector(Vector(Ev.e(6))))
    assert(ProgressRequirement.compute(3, hadUnfold = true, past).isEmpty)
    // batch delivered an unfold and the tail still carries it: revision-gated
    val withU = StreamState().ingest(Vector(Ev.e(0), Ev.e(1), Ev.e(2), Ev.u(3)))
    assert(ProgressRequirement.compute(3, hadUnfold = true, withU) ==
      Some(ProgressRequirement.ofPosUnfoldRevision(3, withU.revision)))
    // batch delivered an unfold but the tail set moved on: bare position
    assert(ProgressRequirement.compute(2, hadUnfold = true, withU) ==
      Some(ProgressRequirement.ofPos(2)))
    // no unfold in the batch: bare position even with a tail set present
    assert(ProgressRequirement.compute(3, hadUnfold = false, withU) ==
      Some(ProgressRequirement.ofPos(3)))
  }

  test("a snapshot refresh at an unchanged write position re-blocks the checkpoint") {
    val (p, fired) = tracker()
    // batch delivered events 0-2 + an unfold at 3: requirement (3, rev 0)
    p.appendBatch(Map("a" -> ProgressRequirement.ofPosUnfoldRevision(3, 0)), () => fired += 1)
    // a handler that processed only the events (no unfolds) cannot complete it
    p.markAttained("a", HandlerProgress.ofPos(3))
    assert(fired.isEmpty)
    // the handler that consumed the rev-0 unfolds completes it
    p.markAttained("a", HandlerProgress(3, 0))
    assert(fired.toList == List(1))
    // refresh lands (revision now 2): the new batch's requirement is
    // gated on the NEW revision; the stale handler progress cannot
    // satisfy it, a re-handle at rev >= 2 can
    p.appendBatch(Map("a" -> ProgressRequirement.ofPosUnfoldRevision(3, 2)), () => fired += 2)
    p.markAttained("a", HandlerProgress(3, 0))
    assert(fired.toList == List(1))
    p.markAttained("a", HandlerProgress(3, 2))
    assert(fired.toList == List(1, 2))
  }
}
