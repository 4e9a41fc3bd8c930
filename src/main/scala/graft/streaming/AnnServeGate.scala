package graft.streaming

import graft.functions.VectorMath
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ANN serving: a live stream of query vectors answered
  * top-k against the STATIC IVF index the batch q18_ann_ivf builds —
  * the online half of the index/serve split every vector-search
  * deployment runs (index built offline at corpus scale, queries
  * served per micro-batch against the frozen artifact).
  *
  * Routing and scoring are the batch query's own expressions over the
  * batch query's own frames (SimilarityQueries.ivfIndex): quantize the
  * query with the ONE shared ×1e6 quantizer, route to the nearest
  * centroid by integer squared distance, score the routed bucket with
  * the codegen'd integer dot kernel, rank by (dot DESC, cand_id). So
  * serve == batch is structural, and AnnServeGateSpec pins it two
  * ways: the stream result equals the gate applied to the same rows
  * as one batch frame (micro-batch boundaries + redelivery change
  * nothing — the gate is stateless), and for in-corpus probes the
  * result row-for-row equals the oracle-audited q18_ann_ivf.
  *
  * Scale: the centroid table is |labels|·dim rows (broadcast), the
  * index join keys on the routed label — each query touches ONE
  * bucket, never the corpus; the per-batch window is partitioned by
  * qid. The index frame is the thing you'd bucket by label on disk
  * at 100 TB; the plan shape (probe → broadcast route → bucket-keyed
  * join → per-query top-k) is unchanged. */
object AnnServeGate {

  /** (qid, probe_label, cand_id, dot_s, rnk) per incoming (qid, vec)
    * row. `excludeSelf` drops cand_id == qid — used when probes ARE
    * corpus vectors (the q18_ann_ivf convention); leave false for
    * external query ids. */
  def serve(incoming: DataFrame, qn: DataFrame, cent: DataFrame, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val probes = incoming.select(col("qid"),
      VectorMath.quantize(col("vec")).as("qp"))
    val routed = probes
      .select(col("qid"), posexplode(col("qp")).as(Seq("d", "x")))
      .join(broadcast(cent), Seq("d"))
      .groupBy(col("qid"), col("c_label"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).cast("long").as("dist2"))
      .select(col("qid"), col("c_label"),
        expr("row_number() OVER (PARTITION BY qid ORDER BY dist2, c_label)").as("rn"))
      .where(col("rn") === 1)
      .select(col("qid"), col("c_label").as("probe_label"))
    val scored = routed
      .join(probes, Seq("qid"))
      .join(qn.select(col("vec_id").as("cand_id"), col("label").as("probe_label"),
        col("q").as("qc")), Seq("probe_label"))
      .where(if (excludeSelf) col("cand_id") =!= col("qid") else lit(true))
      .select(col("qid"), col("probe_label"), col("cand_id"),
        VectorMath.dotLong(col("qp"), col("qc")).as("dot_s"))
    scored
      .select(col("qid"), col("probe_label"), col("cand_id"), col("dot_s"),
        expr("row_number() OVER (PARTITION BY qid ORDER BY dot_s DESC, cand_id)").as("rnk"))
      .where(col("rnk") <= k)
  }
}
