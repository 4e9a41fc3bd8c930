package graft.core

import graft.core.SpanAlgebra._

/** Tiny manual drive of the public span-algebra API (kept as an
  * executable example: sbt "Test/runMain graft.core.SpanDrive"). */
object SpanDrive {
  def main(args: Array[String]): Unit = {
    val delivered = Seq(
      Vector(Ev.e(3), Ev.e(4), Ev.u(5, "snap")),
      Vector(Ev.e(0), Ev.e(1)),
      Vector(Ev.e(1), Ev.e(2), Ev.e(3)),
      Vector(Ev.e(7), Ev.e(8), Ev.u(9, "snap"), Ev.u(9, "other")))
    val m = merge(delivered)
    println("merged: " + m.map(s => s.map(e => (if (e.isUnfold) "u" else "e") + e.index).mkString(",")))
    val st = delivered.foldLeft(StreamState())(_ ingest _).recordProgress(5)
    println("progress@5: writePos=" + st.writePos + " queue=" + st.queue.map(_.map(_.index)))
    println("requireAll: " + st.tryDispatch(requireAll = true) +
      " relaxed: " + st.tryDispatch(requireAll = false).map(_.map(_.index)))
    println("slice(2,100) of head: " + slice(2, 100)(m.head).map(_.index))
    val p = new ProgressState[String]
    p.appendBatchPos(Map("s-1" -> 5L), () => println("batch1 checkpoint fired"))
    p.appendBatchPos(Map("s-1" -> 9L), () => println("batch2 checkpoint fired"))
    p.markAttained("s-1", 9L)
  }
}
