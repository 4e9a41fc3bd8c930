package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming decontamination gate: incoming training documents are
  * checked against a STATIC eval-holdout 8-gram set as they arrive —
  * the stream-side twin of the batch q18_contamination /
  * q18_decontam_bloom operators (SURVEY §2.12 Q18), and the shape a
  * production ingest uses so contaminated documents never reach the
  * corpus in the first place.
  *
  * Mechanics: per micro-batch, documents explode to distinct 8-gram
  * digests and stream-static LEFT SEMI join the eval gram table; docs
  * with any hit emit as contaminated, the rest pass. The eval table is
  * a bounded artifact (the holdout is small by construction), so on a
  * cluster Spark broadcasts it into every micro-batch — no stream
  * state at all, which is what makes this gate horizontally scalable:
  * unlike the dedup gates there is nothing to shard, every executor
  * filters its partitions independently.
  */
object ContamStream {

  /** Distinct md5 digests of the corpus' 8-grams for `docs`. */
  def gramDigests(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      // Spark's sequence(0, n) DESCENDS for n < 0 — guard short docs
      .where(size(col("ws")) >= 8)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(ws) - 8),
          |  i -> md5(CAST(concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3],
          |                               ws[i+4], ws[i+5], ws[i+6], ws[i+7]) AS BINARY)))"""
          .stripMargin)).as("g"))
      .distinct()

  /** The gate: (doc_id, contaminated) per incoming document. Run this
    * INSIDE `foreachBatch` (the per-batch distinct and the derived
    * self-join are batch plans; wrapping them in foreachBatch keeps the
    * gate stateless, which is the point). `incoming` is one
    * micro-batch of documents (doc_id, text); `evalGrams` is the
    * static digest table from [[gramDigests]] over the holdout. */
  def classify(incoming: DataFrame, evalGrams: Dataset[_]): DataFrame = {
    val hits = gramDigests(incoming)
      .join(evalGrams.toDF().select(col("g")), Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    incoming.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }
}
