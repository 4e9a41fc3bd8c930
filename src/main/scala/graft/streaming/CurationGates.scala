package graft.streaming

import graft.functions.CurationRules
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming curation gates: the Gopher quality rules and the DSIR
  * importance scorer as live ingest filters — the stream-side twins of
  * the batch q18_gopher_quality / q18_dsir operators, following the
  * ContamStream pattern (stateless per-batch, run inside foreachBatch).
  *
  * Both are horizontally scalable by construction: the Gopher rules
  * are row-local expressions (no join, no state — every executor
  * classifies its partitions independently), and the DSIR model is a
  * ≤256-row static artifact broadcast into each micro-batch. Identical
  * classification under redelivery is therefore structural, and
  * spec-pinned in CurationGatesSpec. Every rule expression comes from
  * [[graft.functions.CurationRules]] — the SAME objects the batch
  * operators build from, so stream/batch twin drift is impossible by
  * construction, not by test.
  */
object CurationGates {

  /** Gopher rule flags per incoming document: (doc_id, words_ok,
    * mwl_ok, stop_ok, alpha_ok, keep) — the same integer rules the
    * batch operator aggregates (CurationQueries.q18GopherQuality). */
  def gopherClassify(incoming: DataFrame): DataFrame =
    CurationRules.withGopherFlags(CurationRules.gopherFeatures(incoming))
      .select(col("doc_id"), col("words_ok"), col("mwl_ok"), col("stop_ok"),
        col("alpha_ok"),
        (col("words_ok") && col("mwl_ok") && col("stop_ok") && col("alpha_ok"))
          .as("keep"))

  /** The static DSIR model: per-bucket integer micro-nat log-likelihood
    * delta between the raw pool and the target slice — a ≤256-row
    * artifact a production gate trains once offline and broadcasts.
    * Same delta as CurationQueries.q18Dsir (shared CurationRules
    * formulation). */
  def dsirDelta(corpus: DataFrame, targetLang: String): DataFrame =
    CurationRules.dsirDelta(CurationRules.bucketTf(corpus), targetLang)

  /** The gate: (doc_id, n_tok, weight_unm) per incoming document —
    * the integer tf-weighted sum of the broadcast model's deltas. Run
    * inside foreachBatch; `delta` is the static artifact from
    * [[dsirDelta]]. Buckets absent from the model (gram never seen in
    * training) contribute 0, matching the batch inner-join semantics
    * for in-model docs and degrading gracefully for novel text. */
  def dsirScore(incoming: DataFrame, delta: DataFrame): DataFrame =
    CurationRules.bucketTf(incoming.withColumn("lang", lit(null: String)))
      .join(broadcast(delta), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tok"),
        expr("CAST(sum(CAST(tf AS DECIMAL(19,0)) * coalesce(d, 0)) AS BIGINT)")
          .as("weight_unm"))

  /** Integer stopword-permille quality score — q18_quality_calib's
    * score formula (shared CurationRules expression). */
  private def scoreCol = CurationRules.stopwordScore.as("score")

  /** The static calibration artifact: per-source median score
    * threshold, derived from the bounded (source, score) histogram
    * exactly as the batch q18_quality_calib derives it — a
    * |sources|-row table a production gate trains once per dump. */
  def calibThresholds(corpus: DataFrame): DataFrame = {
    val h = corpus.select(col("source"), scoreCol)
      .groupBy(col("source"), col("score")).agg(count(lit(1)).as("c"))
    val byScoreDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("score").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val bySource = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    h.withColumn("cge", sum(col("c")).over(byScoreDesc).cast("long"))
      .withColumn("n", sum(col("c")).over(bySource).cast("long"))
      .where(lit(2) * col("cge") >= col("n"))
      .groupBy(col("source")).agg(max(col("score")).as("t"))
  }

  /** The gate: (doc_id, score, keep) per incoming document against the
    * broadcast per-source thresholds. Sources absent from the
    * calibration artifact are NOT kept (an uncalibrated dump must be
    * trained before it flows). Stateless, row-local after the tiny
    * broadcast join. */
  def calibClassify(incoming: DataFrame, thresholds: DataFrame): DataFrame =
    incoming.select(col("doc_id"), col("source"), scoreCol)
      .join(broadcast(thresholds), Seq("source"), "left")
      .select(col("doc_id"), col("score"),
        coalesce(col("score") >= col("t"), lit(false)).as("keep"))

  /** The tokenizer gate: (doc_id, n_words, n_tokens, n_chars) per
    * incoming document under a trained BPE merge table — the
    * stream-side twin of the batch q18_bpe_encode operator. `merges`
    * is the k-row (a, b) artifact from
    * [[graft.operators.TextQueries.trainBpeMerges]], trained offline
    * on the corpus and compiled HERE into k stacked codegen'd string
    * folds (a literal-embedded artifact like the DSIR delta model,
    * except it needs no broadcast join at all — the merge table rides
    * the expression tree).
    *
    * Unlike the batch operator (which folds over the corpus-wide
    * DISTINCT-word vocab and joins), the gate folds per word
    * OCCURRENCE: a micro-batch has no corpus vocab to amortize
    * against, and the occurrence-level fold keeps the gate
    * shuffle-free until the per-doc rollup — one exchange per batch,
    * no state, redelivery-identical by construction. Token counts are
    * identical either way (the fold is a pure per-word function);
    * CurationGatesSpec pins the gate against the batch query across
    * batch splits and redelivery. */
  def bpeTokenize(incoming: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    import graft.operators.TextQueries.{applyMerge, BpeSep}
    val enc0 = array_join(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
      BpeSep)
    val encK = merges.foldLeft(enc0) { case (e, (a, b)) => applyMerge(e, a, b) }
    incoming
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) >= 1 && !col("word").contains(BpeSep))
      .select(col("doc_id"), length(col("word")).as("n_ch"),
        size(split(encK, BpeSep)).as("n_tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(col("n_ch")).cast("long").as("n_chars"))
  }

  /** The WordPiece gate: (doc_id, n_words, n_pieces, n_unk) per
    * incoming document — the stream-side twin of the batch
    * q18_wordpiece encoder. `vocab` is the static trained artifact
    * (TextQueries.trainWordpieceVocab, or any piece list); the greedy
    * longest-match-first fold is the SAME wordpieceFold object the
    * batch query runs, applied per word OCCURRENCE for the same
    * reason bpeTokenize folds occurrences: a micro-batch has no
    * corpus vocab to amortize against, and the occurrence-level fold
    * keeps the gate shuffle-free until the per-doc rollup — one
    * exchange per batch, no state, redelivery-identical by
    * construction. n_unk > 0 is the live OOV alarm a tokenizer owner
    * watches on an ingest stream. */
  def wordpieceTokenize(incoming: DataFrame, vocab: Seq[String]): DataFrame = {
    import graft.operators.TextQueries.{wordpieceFold, WpMaxWordLen}
    wordpieceFold(
      incoming.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")).between(1, WpMaxWordLen)), vocab)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("np")).cast("long").as("n_pieces"),
        sum(col("nu")).cast("long").as("n_unk"))
  }

  /** The unigram-LM gate: (doc_id, n_words, enc_upm) per incoming
    * document — the stream-side twin of the batch q18_unigram_seg
    * scorer. `vocab` is the static trained artifact
    * (TextQueries.trainUnigramVocab — piece → integer micro-nat
    * cost); the 24-step linear Viterbi fold is the SAME unigramFold
    * object the batch query runs, applied per word OCCURRENCE for
    * the standard gate reason (no corpus vocab to amortize against
    * in a micro-batch; shuffle-free until the per-doc rollup,
    * redelivery-identical by construction). enc_upm jumping on an
    * ingest stream is the live signal the piece model has drifted
    * from the data (the unigram twin of wordpiece's n_unk alarm). */
  def unigramScore(incoming: DataFrame, vocab: Seq[(String, Long)]): DataFrame = {
    import graft.operators.TextQueries.{unigramFold, WpMaxWordLen}
    unigramFold(
      incoming.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")).between(1, WpMaxWordLen)), vocab)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("cost_um")).cast("long").as("enc_upm"))
  }

  /** Shared bigram extraction for the LM gate and its trainer — the
    * exact transform q18_heldout_ppl uses (guarding 1-word docs:
    * Spark's sequence(0, n) DESCENDS for n < 0). */
  private def bigramsOf(d: DataFrame): DataFrame = d
    .select(col("doc_id"), split(col("text"), " ").as("ws"))
    .where(size(col("ws")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2, concat_ws(' ', ws[i], ws[i+1]) AS b))"))
      .as("p"))
    .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"),
      col("p.b").as("b"))

  /** The static bigram-LM artifact for the perplexity gate: the
    * add-1-smoothed model q18_heldout_ppl trains on the reference
    * split — (vocab(b, cnt), pre(w1, cnt1), v = distinct-successor
    * vocabulary size). A production gate trains this once offline on
    * reference data and keeps the two frames as stream-static join
    * sides; only v (one number) crosses to the driver. */
  def bigramLm(train: DataFrame): (DataFrame, DataFrame, Long) = {
    val tbg = bigramsOf(train)
    val vocab = tbg.groupBy(col("b"))
      .agg(count(lit(1)).as("cnt"))
    val pre = tbg.groupBy(col("w1"))
      .agg(count(lit(1)).cast("long").as("cnt1"))
    val v = tbg.agg(countDistinct(col("w2"))).head.getLong(0)
    (vocab, pre, v)
  }

  /** The perplexity gate: (doc_id, n_bg, sur_upm, avg_upm, n_oov) per
    * incoming document under the STATIC bigram LM — the stream-side
    * twin of the batch q18_heldout_ppl scorer (same smoothing, same
    * one-ln-then-round-to-micro-nats discipline, so a val document
    * scores identically through the gate and the batch query;
    * spec-pinned at source rollup grain). avg_upm rising on an ingest
    * stream is the live perplexity-filter signal that the candidate
    * stream has drifted from the reference LM; n_oov is its
    * sharp-edge companion (bigrams whose w1 the LM never saw).
    * Stateless per-batch: two stream-static left joins against the
    * broadcast-or-shuffled model frames, then a doc-keyed rollup —
    * identical under redelivery by construction. */
  def perplexityScore(incoming: DataFrame, vocab: DataFrame,
      pre: DataFrame, v: Long): DataFrame =
    bigramsOf(incoming)
      .join(vocab.select(col("b"), col("cnt"), lit(1).as("seen")), Seq("b"), "left")
      .join(pre.select(col("w1"), col("cnt1")), Seq("w1"), "left")
      .select(col("doc_id"),
        expr(s"""CAST(round(1000000 * CASE
                 WHEN cnt1 IS NULL THEN ln(CAST(${v}L AS DOUBLE))
                 ELSE ln(CAST(cnt1 + ${v}L AS DOUBLE) / (coalesce(cnt, 0) + 1))
               END) AS BIGINT)""").as("sp_um"),
        when(col("seen").isNull, 1L).otherwise(0L).as("oov"))
      .groupBy(col("doc_id"))
      .agg(sum(col("sp_um")).cast("long").as("sur_upm"),
        count(lit(1)).cast("long").as("n_bg"),
        sum(col("oov")).cast("long").as("n_oov"))
      .select(col("doc_id"), col("n_bg"), col("sur_upm"),
        expr("sur_upm div n_bg").as("avg_upm"), col("n_oov"))

  /** The PII gate: (doc_id, n_email, n_ip, n_phone, had_pii, scrubbed)
    * per incoming document — the stream-side twin of the batch
    * q18_pii_scrub operator, redacting email/IPv4/phone (fixed mask
    * order) as data lands instead of in a corpus-wide pass.
    *
    * Pure per-row regex map over the SAME CurationRules patterns the
    * batch oracle proves out: no join, no state, no shuffle — every
    * executor redacts its partitions independently, so redelivery
    * yields byte-identical scrubbed text structurally (spec-pinned in
    * CurationGatesSpec alongside the other gates). */
  def piiScrub(incoming: DataFrame): DataFrame = {
    val counts = CurationRules.piiCounts("text").map { case (n, c) => c.as(n) }
    incoming
      .select(Seq(col("doc_id")) ++ counts :+
        CurationRules.piiScrubbed(col("text")).as("scrubbed"): _*)
      .withColumn("had_pii",
        col("n_email") + col("n_ip") + col("n_phone") > 0)
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
        col("had_pii"), col("scrubbed"))
  }
}
