package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** TextQueries.unigramFold — the 24-step linear Viterbi recurrence —
  * pinned against a brute-force Scala DP over the same integer piece
  * costs: every word's folded cost must equal the exact min-cost
  * segmentation, including words that force the single-char fallback,
  * length-1 words, and the max supported length. */
class UnigramSegSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-unigram-seg-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Exact DP reference (no shared code with unigramFold). */
  private def viterbi(w: String, costs: Map[String, Long]): Long = {
    val best = Array.fill[Option[Long]](w.length + 1)(None)
    best(0) = Some(0L)
    for (i <- 1 to w.length; l <- 1 to math.min(4, i)) {
      val piece = w.substring(i - l, i)
      (best(i - l), costs.get(piece)) match {
        case (Some(b), Some(c)) =>
          if (best(i).forall(_ > b + c)) best(i) = Some(b + c)
        case _ => ()
      }
    }
    best(w.length).get
  }

  test("folded Viterbi cost equals the brute-force DP on a mixed vocab") {
    import spark.implicits._
    // multi-char pieces cheaper than their chars — the DP must prefer
    // them; 'zq' absent from multi-char vocab — must fall back to chars
    val vocab: Seq[(String, Long)] = Seq(
      "ab" -> 100L, "abc" -> 90L, "bcd" -> 80L, "cdab" -> 60L,
      "a" -> 500L, "b" -> 400L, "c" -> 450L, "d" -> 350L,
      "z" -> 900L, "q" -> 950L)
    val costs = vocab.toMap
    val words = Seq(
      "a", "ab", "abc", "abcd", "abcdab", "zq", "zqa",
      "dcba",                     // reversed: only char path exists
      "abcabcabcabcabcabcabcdab", // length 24 (max)
      "cdabcdab")
    words.foreach(w => assert(w.length <= 24))
    val got = TextQueries.unigramFold(words.toDF("w"), vocab)
      .select("w", "cost_um").as[(String, Long)].collect().toMap
    words.foreach { w =>
      assert(got(w) == viterbi(w, costs),
        s"'$w': fold=${got(w)} brute=${viterbi(w, costs)}")
    }
    // sanity: the DP genuinely beat greedy-longest somewhere — 'abcd'
    // as abc+d (90+350=440) loses to ab+cd? cd absent; a+bcd =
    // 500+80=580; abc+d=440 wins; chars = 1700 — multi-piece path used
    assert(got("abcd") == 440L)
    // 'cdabcdab' : cdab+cdab = 120 — the 4-char piece path
    assert(got("cdabcdab") == 120L)
  }
}
