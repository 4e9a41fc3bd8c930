package graft.streaming

import graft.functions.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count monitor: per-source shingle cardinality
  * tracked across micro-batches with 64 bytes of HLL register state
  * per source — the stream twin of the batch q18_hll_audit estimator.
  *
  * The state fold is max-per-register, which is commutative,
  * associative, and IDEMPOTENT: a redelivered (at-least-once) batch
  * folds to the same registers, so the gate needs NO dedup ledger to
  * survive reprocessing — the sketch itself absorbs duplicates. That
  * is the operational reason production pipelines ship sketches
  * instead of exact distinct state (which would need per-value
  * memory AND exactly-once bookkeeping). After any prefix of the
  * stream, the emitted estimate equals the batch estimator run over
  * the same prefix (spec-pinned: DistinctGateSpec drives the corpus
  * through in batches, with a duplicate re-feed, and asserts integer
  * equality with q18_hll_audit's n_est).
  *
  * Scale: the per-batch explode/hash runs distributed; each source's
  * group fold touches 64 ints; state per source is one 64-int array
  * regardless of corpus size. 10^4 sources × 64 B is nothing — the
  * gate scales in SOURCES, never in VALUES. */
object DistinctGate {

  /** (source, n_est, n_zero_reg) per micro-batch per source seen so
    * far (update mode). `incoming` needs (source, text). */
  def distinctShingles(incoming: DataFrame): Dataset[(String, Long, Long)] = {
    val spark = incoming.sparkSession
    import spark.implicits._
    val ranked = Sketches.hllRanked(
      incoming
        .select(col("source"), split(col("text"), " ").as("ws"))
        // match the batch hllShingles guard (and bigramsOf): <3-word
        // docs would otherwise yield degenerate shingles via the
        // descending sequence(0, size-3) + null-skipping concat_ws.
        .where(size(col("ws")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
          .as("s")),
      "source", "s")
      .select(col("source"), col("idx").cast("int"), col("rank").cast("int"))
      .as[(String, Int, Int)]
    ranked
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (src: String, rows: Iterator[(String, Int, Int)],
         state: GroupState[Array[Int]]) => {
          val regs = state.getOption.getOrElse(Array.fill(Sketches.HllM)(0))
          rows.foreach { case (_, i, r) => if (r > regs(i)) regs(i) = r }
          state.update(regs)
          Iterator((src, Sketches.hllEstimateLocal(regs),
            regs.count(_ == 0).toLong))
        })
  }
}
