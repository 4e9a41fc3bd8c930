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

  // --- Unfold-revision invariants (reference Streams.fs:155-231,
  //     tests/Propulsion.Tests/StreamStateTests.fs — re-stated) ---

  test("merge: unfolds are a strict suffix of every span they appear in") {
    // the invariant tailHasUnfoldAt's last-element test silently
    // depends on (Streams.fs:184-187 checks the tail EVENT)
    check(Prop.forAll(genSpans) { spans =>
      merge(spans).forall(s => s.dropWhile(!_.isUnfold).forall(_.isUnfold))
    })
  }

  test("tailHasUnfoldAt: last-element test agrees with last-unfold test on canonical queues") {
    check(Prop.forAll(genSpans, Gen.chooseNum(0L, 60L)) { (spans, idx) =>
      val st = spans.foldLeft(StreamState())(_ ingest _)
      val byLastUnfold = tailUnfolds(st.queue).lastOption.exists(_.index == idx)
      st.tailHasUnfoldAt(idx) == byLastUnfold
    })
  }

  test("revision: pure-event ingest never bumps") {
    check(Prop.forAll(genSpans) { spans =>
      val eventsOnly = spans.map(_.filterNot(_.isUnfold)).filter(_.nonEmpty)
      val st = eventsOnly.foldLeft(StreamState())(_ ingest _)
      st.revision == RevisionInitial
    })
  }

  test("revision: bumps when the tail unfold set appears, vanishes, is replaced, or is redelivered") {
    // appear: empty tail -> unfolds
    val st0 = StreamState().ingest(Vector(Ev.e(0), Ev.e(1), Ev.u(2)))
    assert(st0.revision == RevisionInitial + 1)
    // redeliver: value-identical snapshot wins the tail slot (the
    // reference compares object identity, so a redelivery is always a
    // change; we bump conservatively on value-identical redelivery too)
    val st1 = st0.ingest(Vector(Ev.u(2)))
    assert(st1.revision == st0.revision + 1)
    // replace: fresher events + fresher unfold set
    val st2 = st1.ingest(Vector(Ev.e(2), Ev.e(3), Ev.u(4, "ub")))
    assert(st2.revision == st1.revision + 1)
    // vanish: events advancing past the unfold index drop the stale set
    val st3 = st2.ingest(Vector(Ev.e(4), Ev.e(5)))
    assert(tailUnfolds(st3.queue).isEmpty)
    assert(st3.revision == st2.revision + 1)
    // pure-event ingest that doesn't disturb the (absent) tail set: no bump
    val st4 = st3.ingest(Vector(Ev.e(6)))
    assert(st4.revision == st3.revision)
  }

  test("revision: over-bump never under-bumps vs the reference's physical-equality rule") {
    // any case where the reference would increment (tail unfold set
    // appearing/vanishing, or a different last-unfold value) must also
    // increment here; we may additionally bump on value-identical
    // redelivery (safe: delays checkpoints, never loses one)
    check(Prop.forAll(genSpans) { spans =>
      var st = StreamState()
      spans.forall { span =>
        val before = tailUnfolds(st.queue).lastOption
        val next = st.ingest(span)
        val after = tailUnfolds(next.queue).lastOption
        val refWouldBump = (before, after) match {
          case (None, None) => false
          case (None, Some(_)) | (Some(_), None) => true
          case (Some(a), Some(b)) => a != b
        }
        val bumped = next.revision == st.revision + 1
        st = next
        !refWouldBump || bumped
      }
    })
  }

  test("tryTrimUnfolds: strips and bumps only when pos AND revision still match") {
    // handled unfolds linger at the write position (their index IS the
    // next write position, reference parser: unfolds bear Index = n)
    val st = StreamState().ingest(Vector(Ev.e(0), Ev.e(1), Ev.e(2), Ev.u(3)))
      .recordProgress(3)
    assert(st.writePos == 3 && st.queue.flatten == Vector(Ev.u(3)))
    // matching (pos, revision): unfolds stripped, revision bumped
    val trimmed = st.tryTrimUnfolds(3, st.revision)
    assert(trimmed.exists(t => t.queue.isEmpty && t.revision == st.revision + 1))
    // stale position: no-op
    assert(st.tryTrimUnfolds(2, st.revision).isEmpty)
    // stale revision (a fresh snapshot landed while the handler ran): no-op
    val refreshed = st.ingest(Vector(Ev.u(3, "ub")))
    assert(refreshed.revision == st.revision + 1)
    assert(refreshed.tryTrimUnfolds(3, st.revision).isEmpty)
    assert(refreshed.tryTrimUnfolds(3, refreshed.revision).nonEmpty)
  }

  test("combine: revision derives from the resident state, bumping when the merged tail set differs") {
    val a = StreamState().ingest(Vector(Ev.e(0), Ev.e(1)))
    assert(a.revision == RevisionInitial)
    // b contributes an unfold set: combine must bump a's revision
    val b = StreamState().ingest(Vector(Ev.e(2), Ev.u(3)))
    val c = combine(a, b)
    assert(c.revision == a.revision + 1)
    assert(c.tailHasUnfoldAt(3))
    // combining with a pure-event state leaves the revision alone
    val d = combine(a, StreamState().ingest(Vector(Ev.e(2), Ev.e(3))))
    assert(d.revision == a.revision)
  }
}
