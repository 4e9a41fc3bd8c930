package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curation rule expressions shared by the batch operators
  * (graft.operators.CurationQueries) and their streaming gate twins
  * (graft.streaming.CurationGates).
  *
  * The stream/batch equivalence the gate specs pin is only meaningful
  * if both sides evaluate the SAME expressions — these used to be
  * manually duplicated constants (stopword list, Gopher bands, DSIR
  * delta math) that could silently drift, so they live here once and
  * both sides call in (round-7 advisory fix).
  */
object CurationRules {

  /** The stopword evidence list every quality rule keys on. */
  val stopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** The same list as a SQL IN-list fragment for `expr` lambdas. */
  val stopWordsIn: String = stopWords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Per-doc integer Gopher features over a `text` column: word count,
    * summed word length, stopword hits, alphabetic-word hits. Keeps all
    * input columns (callers project what they need; Catalyst prunes the
    * rest). */
  def gopherFeatures(docs: DataFrame): DataFrame =
    docs.select(col("*"),
      size(split(col("text"), " ")).as("n_words"),
      length(replace(col("text"), lit(" "), lit(""))).cast("long").as("sum_wl"),
      expr(s"size(filter(split(text, ' '), w -> w IN $stopWordsIn))").as("n_stop"),
      expr("size(filter(split(text, ' '), w -> w rlike '^[a-z]+$'))").as("n_alpha"))

  /** The four Gopher rule flags (Rae et al. 2021 §A1.1 reduced set)
    * over [[gopherFeatures]] output — every rule an integer comparison
    * (bands cross-multiplied, never divided). */
  def withGopherFlags(feat: DataFrame): DataFrame =
    feat
      .withColumn("words_ok", col("n_words").between(40, 100000))
      .withColumn("mwl_ok",
        col("sum_wl").between(lit(3) * col("n_words"), lit(10) * col("n_words")))
      .withColumn("stop_ok", col("n_stop") >= 2)
      .withColumn("alpha_ok", lit(5) * col("n_alpha") >= lit(4) * col("n_words"))

  /** Integer stopword-permille quality score (q18_quality_calib and the
    * calibration gate). */
  def stopwordScore: Column =
    expr(s"""(1000 * size(filter(split(text, ' '), w -> w IN $stopWordsIn)))
            | div size(split(text, ' '))""".stripMargin)

  /** (doc_id, lang, b, tf) hashed-unigram doc-term matrix: md5-bucket
    * B=256 (first two hex digits — portable across engines). The ONE
    * token pass every bag-of-words curation model derives from. */
  def bucketTf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .withColumn("b",
        conv(substring(md5(col("w").cast("binary")), 1, 2), 16, 10).cast("long"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("tf"))

  /** PII patterns (email → IPv4 → phone, masked in that fixed order).
    * Written backslash-free ([0-9], [.]) so ONE literal parses
    * identically under Spark's and DuckDB's string-escape rules —
    * the batch oracle (q18_pii_scrub) and the streaming gate
    * (CurationGates.piiScrub) share these exact strings. */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val piiIp = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val piiPhone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Per-category PII hit counts over a text column (named by column). */
  def piiCounts(textCol: String): Seq[(String, Column)] = Seq(
    "n_email" -> expr(s"regexp_count($textCol, '$piiEmail')"),
    "n_ip" -> expr(s"regexp_count($textCol, '$piiIp')"),
    "n_phone" -> expr(s"regexp_count($textCol, '$piiPhone')"))

  /** The redacted text: all three categories masked, fixed order. */
  def piiScrubbed(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      lit(piiEmail), lit("<EMAIL>")),
      lit(piiIp), lit("<IP>")),
      lit(piiPhone), lit("<PHONE>"))

  /** DSIR per-bucket log-likelihood delta (Xie et al. 2023) in integer
    * micro-nats, from a [[bucketTf]]-shaped matrix: add-1 smoothed,
    * rounded ONCE per bucket so downstream sums are order-independent.
    * ≤256 rows — the static artifact a production gate broadcasts. */
  def dsirDelta(dtf: DataFrame, targetLang: String): DataFrame = {
    val rawB = dtf.groupBy(col("b")).agg(sum(col("tf")).as("cr"))
    val tgtB = dtf.where(col("lang") === targetLang)
      .groupBy(col("b")).agg(sum(col("tf")).as("ct"))
    val tot = rawB.agg(sum(col("cr")).cast("long").as("nr"))
      .crossJoin(broadcast(tgtB.agg(coalesce(sum(col("ct")), lit(0L)).cast("long").as("nt"))))
    rawB.join(tgtB, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        (expr("CAST(round(1000000 * ln(CAST(nr + 256 AS DOUBLE) / (cr + 1))) AS BIGINT)") -
          expr("CAST(round(1000000 * ln(CAST(nt + 256 AS DOUBLE) / (coalesce(ct, 0) + 1))) AS BIGINT)"))
          .as("d"))
  }
}
