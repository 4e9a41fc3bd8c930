package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared deterministic-HyperLogLog building blocks — the ONE set of
  * expressions the batch estimator audit (TextQueries.q18HllAudit),
  * the merge audit, and the streaming distinct-count gate
  * (streaming.DistinctGate) all build from, so batch/stream/merge
  * drift is impossible by construction.
  *
  * Parameters are fixed (m = 64 registers, rank clamped at 25, alpha
  * at ppm precision) so every consumer computes the same integers;
  * see q18_hll_audit's scaladoc for the numeric-range argument.
  */
object Sketches {
  /** Register count (2^6). */
  val HllM = 64
  /** Rank clamp: keeps Σ 2^(Cap−M) in exact BIGINT range. */
  val HllRankCap = 25
  /** α_ppm·m²·2^Cap = 709341·4096·2^25. */
  val HllNumerator = 97491084694781952L

  /** Register index off an md5-hex column: low 6 bits of byte 0. */
  def hllIdx(h: String): Column =
    expr(s"CAST(conv(substring($h, 1, 2), 16, 10) AS BIGINT) % $HllM")

  /** Clamped rank off an md5-hex column: leading zeros of the next
    * 60 bits + 1, computed as 61 − bin-length. */
  def hllRank(h: String): Column =
    expr(s"""CASE WHEN CAST(conv(substring($h, 3, 15), 16, 10) AS BIGINT) = 0 THEN ${HllRankCap}L
             ELSE least(${HllRankCap}L, 61L - length(bin(CAST(conv(substring($h, 3, 15), 16, 10) AS BIGINT)))) END""")

  /** (key, idx, rank) per distinct value occurrence — feed of both the
    * register aggregate and the streaming gate's state update. */
  def hllRanked(d: DataFrame, key: String, value: String): DataFrame =
    d.withColumn("_h", md5(col(value).cast("binary")))
      .select(col(key), hllIdx("_h").as("idx"), hllRank("_h").as("rank"))

  /** Registers per key: (key, idx, m) — max is commutative,
    * associative, and IDEMPOTENT, which is what makes the sketch
    * mergeable across partitions, layers, and redelivered batches. */
  def hllRegisters(d: DataFrame, key: String, value: String): DataFrame =
    hllRanked(d, key, value)
      .groupBy(col(key), col("idx")).agg(max(col("rank")).as("m"))

  /** Raw-estimate arithmetic over a register frame: (key, ssum,
    * n_zero_reg, n_est) — ONE truncating integer division, identical
    * on both engines. */
  def hllEstimate(regs: DataFrame, key: String): DataFrame =
    regs.groupBy(col(key))
      .agg(expr(s"CAST(sum(shiftleft(CAST(1 AS BIGINT), CAST($HllRankCap - m AS INT))) " +
        s"+ ($HllM - count(1)) * shiftleft(CAST(1 AS BIGINT), $HllRankCap) AS BIGINT)").as("ssum"),
        expr(s"CAST($HllM - count(1) AS BIGINT)").as("n_zero_reg"))
      .select(col(key),
        expr(s"${HllNumerator}L div (ssum * 1000000L)").as("n_est"),
        col("n_zero_reg"))

  /** Estimate from a local register array (the streaming gate's state
    * fold) — the same integers hllEstimate computes distributively.
    * regs(i) = 0 means "register never hit", matching the batch
    * (m − count)·2^Cap term. */
  def hllEstimateLocal(regs: Array[Int]): Long = {
    var ssum = 0L
    var i = 0
    while (i < HllM) { ssum += 1L << (HllRankCap - regs(i)); i += 1 }
    HllNumerator / (ssum * 1000000L)
  }
}
