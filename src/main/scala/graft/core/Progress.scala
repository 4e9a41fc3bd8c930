package graft.core

import scala.collection.mutable

/** Batch-ordered progress lattice (reference semantics:
  * src/Propulsion/Streams.fs:709-750 + tests/ProgressTests.fs:16-54):
  *
  *  - a batch carries per-stream required positions;
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

  private final case class Batch(reqs: mutable.Map[S, Long], onComplete: () => Unit)

  private val batches = mutable.Queue.empty[Batch]

  def appendBatch(reqs: Map[S, Long], onComplete: () => Unit): Unit = {
    batches.enqueue(Batch(mutable.Map.from(reqs), onComplete))
    drainCompleted()
  }

  /** A handler for `stream` reached `pos` (its next write position). */
  def markAttained(stream: S, pos: Long): Unit = {
    batches.foreach { b =>
      b.reqs.get(stream) match {
        case Some(req) if pos >= req => b.reqs.remove(stream)
        case _ => ()
      }
    }
    drainCompleted()
  }

  /** Positions still required, lowest requirement per stream (what must
    * be scheduled next). */
  def pendingRequirements: Map[S, Long] =
    batches.iterator.flatMap(_.reqs).toList
      .groupMapReduce(_._1)(_._2)(math.min)

  def inFlightBatches: Int = batches.size

  private def drainCompleted(): Unit = {
    while (batches.headOption.exists(_.reqs.isEmpty))
      batches.dequeue().onComplete()
  }
}
