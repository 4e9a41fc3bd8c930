package graft.core

import graft.core.SpanAlgebra._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property ports of the reference merge/dedupe invariants
  * (tests/Propulsion.Tests/StreamStateTests.fs:112-176 and
  * SpanQueueTests.fs:21-60 — re-stated, not translated). */
class SpanAlgebraSpec extends AnyFunSuite {

  /** scalatestplus isn't on the offline classpath; drive ScalaCheck
    * directly. Assertion throws inside the Prop register as failures. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  private val genSpan: Gen[Span] = for {
    start <- Gen.chooseNum(0L, 40L)
    n <- Gen.chooseNum(1, 9)
    types <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    uCount <- Gen.chooseNum(0, 2)
    uTypes <- Gen.listOfN(uCount, Gen.oneOf("ua", "ub"))
  } yield {
    val events = types.zipWithIndex.map { case (t, i) => Ev.e(start + i, t, size = i + 1) }
    val unfolds = uTypes.map(t => Ev.u(start + n, t))
    (events ++ unfolds).toVector
  }

  private val genSpans: Gen[List[Span]] = Gen.listOfN(6, genSpan)

  private def eventsOf(spans: Seq[Span]): Vector[Ev] =
    spans.toVector.flatten.filterNot(_.isUnfold)
  private def unfoldsOf(spans: Seq[Span]): Vector[Ev] =
    spans.toVector.flatten.filter(_.isUnfold)

  test("merge: spans are ordered, non-empty, gap >= 1 apart, duplicate-free") {
    check(Prop.forAll(genSpans) { spans =>
      val merged = merge(spans)
      assert(merged.forall(_.nonEmpty))
      val starts = merged.map(spanIndex)
      assert(starts == starts.sorted)
      merged.foreach { s =>
        val idxs = s.filterNot(_.isUnfold).map(_.index)
        assert(idxs == idxs.sorted && idxs.distinct == idxs)
        if (idxs.nonEmpty) assert(idxs.last - idxs.head == idxs.size - 1)
      }
      merged.sliding(2).foreach {
        case Vector(a, b) => assert(spanIndex(b) > nextIndex(a))
        case _ => ()
      }
      val allIdx = eventsOf(merged).map(_.index)
      assert(allIdx.distinct == allIdx)
      true
    })
  }

  test("merge: no event is lost or invented (by index)") {
    check(Prop.forAll(genSpans) { spans =>
      eventsOf(merge(spans)).map(_.index).toSet ==
        eventsOf(spans).map(_.index).toSet
    })
  }

  test("merge: unfolds only in last span, one per type, freshest set, not behind events") {
    check(Prop.forAll(genSpans) { spans =>
      val merged = merge(spans)
      val us = unfoldsOf(merged)
      if (us.nonEmpty) {
        assert(merged.init.forall(_.forall(!_.isUnfold)))
        assert(us.map(_.index).distinct.size == 1)
        assert(us.map(_.eventType).distinct.size == us.size)
        val lastEvent = eventsOf(merged).lastOption
        lastEvent.foreach(e => assert(us.head.index >= e.index))
        assert(us.head.index == unfoldsOf(spans).map(_.index).max)
      }
      true
    })
  }

  test("merge is idempotent") {
    check(Prop.forAll(genSpans) { spans =>
      val once = merge(spans)
      merge(once) == once
    })
  }

  test("merge is order-insensitive over input spans") {
    check(Prop.forAll(genSpans) { spans =>
      // event payload may differ per duplicate index across spans (first
      // delivery wins), so compare the structure that must be stable:
      // indexes, islands, unfold set.
      def shape(m: Vector[Span]) =
        (m.map(_.filterNot(_.isUnfold).map(_.index)),
          unfoldsOf(m).map(u => (u.index, u.eventType)).sortBy(_.toString))
      shape(merge(spans)) == shape(merge(spans.reverse))
    })
  }

  test("dropBefore removes everything below pos and nothing at/above") {
    check(Prop.forAll(genSpans, Gen.chooseNum(0L, 60L)) { (spans, pos) =>
      val dropped = dropBefore(pos)(merge(spans))
      assert(dropped.flatten.forall(_.index >= pos))
      val survivors = eventsOf(merge(spans)).map(_.index).filter(_ >= pos).toSet
      eventsOf(dropped).map(_.index).toSet == survivors
    })
  }

  test("slice: >= 1 item, prefix, budget-bounded, unfold suffix atomic") {
    check(Prop.forAll(genSpan, Gen.chooseNum(1, 6), Gen.chooseNum(1L, 20L)) {
      (span, maxE, maxB) =>
        val s = merge(Seq(span)).headOption.getOrElse(Vector.empty)
        if (s.isEmpty) true
        else {
          val sl = slice(maxE, maxB)(s)
          assert(sl.nonEmpty)
          val events = sl.filterNot(_.isUnfold)
          val inU = sl.count(_.isUnfold)
          val allU = s.count(_.isUnfold)
          // unfold suffix all-or-nothing
          assert(inU == 0 || inU == allU)
          // budget honored beyond the mandatory first item
          if (events.sizeIs > 1)
            assert(events.size <= maxE && events.map(_.size).sum <= maxB)
          // slice is a prefix of the span's events
          assert(s.startsWith(events))
          // when every event fits, the unfold suffix ships unconditionally
          // (budget-exempt — reference trimEvents/slice semantics)
          if (events.size == s.count(!_.isUnfold)) assert(inU == allU)
          true
        }
    })
  }

  test("StreamState: ingest + recordProgress implement write-position dedupe") {
    check(Prop.forAll(genSpans, Gen.chooseNum(0L, 50L)) { (spans, progress) =>
      val st0 = spans.foldLeft(StreamState())(_ ingest _)
      val st1 = st0.recordProgress(progress)
      assert(st1.writePos >= progress)
      assert(st1.queue.flatten.forall(_.index >= progress))
      // re-delivering already-processed spans is a no-op below writePos
      val redelivered = spans.foldLeft(st1)(_ ingest _)
      redelivered.queue.flatten.forall(_.index >= progress)
    })
  }

  test("combine: max write pos, sticky malformed, canonical union") {
    check(Prop.forAll(genSpans, genSpans) { (as, bs) =>
      val a = as.foldLeft(StreamState())(_ ingest _)
      val b = bs.foldLeft(StreamState())(_ ingest _).copy(malformed = true)
      val c = combine(a, b)
      assert(c.writePos == math.max(a.writePos, b.writePos))
      assert(c.malformed)
      merge(c.queue) == c.queue
    })
  }

  test("requireAll gap-guard holds back gapped queues") {
    val gapped = Vector(Vector(Ev.e(5), Ev.e(6)))
    assert(StreamState(writePos = 3, queue = gapped).tryDispatch(requireAll = true).isEmpty)
    assert(StreamState(writePos = 3, queue = gapped).tryDispatch(requireAll = false).nonEmpty)
    assert(StreamState(writePos = 5, queue = gapped).tryDispatch(requireAll = true).nonEmpty)
  }
}
