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
    p.appendBatch(Map.empty, () => fired += 1)
    assert(fired.toList == List(1))
    assert(p.inFlightBatches == 0)
  }

  test("batch completes only when all stream requirements are attained") {
    val (p, fired) = tracker()
    p.appendBatch(Map("a" -> 2L, "b" -> 3L), () => fired += 1)
    p.markAttained("a", 2L)
    assert(fired.isEmpty)
    p.markAttained("b", 2L) // not enough
    assert(fired.isEmpty)
    p.markAttained("b", 3L)
    assert(fired.toList == List(1))
  }

  test("completion is strictly batch-ordered") {
    val (p, fired) = tracker()
    p.appendBatch(Map("a" -> 2L), () => fired += 1)
    p.appendBatch(Map("b" -> 1L), () => fired += 2)
    p.markAttained("b", 5L) // batch 2 satisfied but batch 1 still open
    assert(fired.isEmpty)
    p.markAttained("a", 2L)
    assert(fired.toList == List(1, 2))
  }

  test("a later empty batch waits for earlier incomplete ones") {
    val (p, fired) = tracker()
    p.appendBatch(Map("a" -> 1L), () => fired += 1)
    p.appendBatch(Map.empty, () => fired += 2)
    assert(fired.isEmpty)
    p.markAttained("a", 9L)
    assert(fired.toList == List(1, 2))
  }

  test("requirements do not persist across batches") {
    val (p, fired) = tracker()
    p.appendBatch(Map("a" -> 1L), () => fired += 1)
    p.markAttained("a", 1L)
    assert(fired.toList == List(1))
    // a new batch requiring a position already passed still needs a fresh mark
    p.appendBatch(Map("a" -> 1L), () => fired += 2)
    assert(fired.toList == List(1))
    p.markAttained("a", 1L)
    assert(fired.toList == List(1, 2))
  }

  test("pendingRequirements reports the minimum required position per stream") {
    val (p, _) = tracker()
    p.appendBatch(Map("a" -> 5L, "b" -> 2L), () => ())
    p.appendBatch(Map("a" -> 3L), () => ())
    assert(p.pendingRequirements == Map("a" -> 3L, "b" -> 2L))
  }
}
