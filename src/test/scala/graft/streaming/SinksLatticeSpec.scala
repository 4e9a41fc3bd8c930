package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property suite for the sink's pure island-classification fold
  * (AppendSink.classifyIslands) — the span-at-a-time outcome lattice of
  * the reference sink (CosmosStoreSink.fs:76-83), exercised over random
  * targets and random island sets (no Spark session needed). */
class SinksLatticeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  /** Random disjoint islands with gaps >= 1 between them. */
  private val genIslands: Gen[List[(Long, Long)]] =
    for {
      k <- Gen.chooseNum(0, 6)
      starts <- Gen.listOfN(k, Gen.chooseNum(0L, 30L))
      lens <- Gen.listOfN(k, Gen.chooseNum(1L, 5L))
      gaps <- Gen.listOfN(k, Gen.chooseNum(1L, 4L))
    } yield {
      var next = starts.headOption.getOrElse(0L)
      starts.lazyZip(lens).lazyZip(gaps).map { (s, len, gap) =>
        val i = math.max(s, next)
        next = i + len + gap
        (i, i + len)
      }
    }

  private val genTgt: Gen[Long] = Gen.chooseNum(0L, 40L)

  private def accepted(tgt: Long, islands: List[(Long, Long)]): Seq[(Long, Long, Long, String)] =
    AppendSink.classifyIslands(tgt, islands)
      .filter(r => r._4 == "Ok" || r._4 == "PartialDuplicate")

  test("accepted spans form one contiguous run from the target position") {
    check(Prop.forAll(genTgt, genIslands) { (tgt, islands) =>
      val acc = accepted(tgt, islands)
      // each accepted island starts exactly at the effective position,
      // so appended indexes are [tgt, effFinal) with no hole
      val appendedIdx = acc.flatMap { case (i, n, eff, _) => math.max(i, eff) until n }
      appendedIdx.isEmpty ||
        (appendedIdx.min == tgt && appendedIdx == (tgt until (appendedIdx.max + 1)))
    })
  }

  test("no gap is ever persisted: islands after the first gap are PrefixMissing") {
    check(Prop.forAll(genTgt, genIslands) { (tgt, islands) =>
      val out = AppendSink.classifyIslands(tgt, islands)
      val firstMissing = out.indexWhere(_._4 == "PrefixMissing")
      firstMissing == -1 ||
        out.drop(firstMissing).forall(_._4 == "PrefixMissing")
    })
  }

  test("redelivery against the advanced target is all-Duplicate (idempotent)") {
    check(Prop.forAll(genTgt, genIslands) { (tgt, islands) =>
      val acc = accepted(tgt, islands)
      acc.isEmpty || {
        val effFinal = acc.map(_._2).max
        val redelivered = islands.filter { case (_, n) => n <= effFinal }
        AppendSink.classifyIslands(effFinal, redelivered)
          .forall(_._4 == "Duplicate")
      }
    })
  }

  test("classification partitions the batch: every island gets exactly one outcome") {
    check(Prop.forAll(genTgt, genIslands) { (tgt, islands) =>
      val out = AppendSink.classifyIslands(tgt, islands)
      out.map(r => (r._1, r._2)).sorted == islands.map(i => (i._1, i._2)).sorted &&
        out.forall(r =>
          Set("Ok", "Duplicate", "PartialDuplicate", "PrefixMissing").contains(r._4))
    })
  }
}
