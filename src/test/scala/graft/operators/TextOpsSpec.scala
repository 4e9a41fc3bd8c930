package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the round-3 text-pipeline operators:
  * each test writes a toy corpus as `<dir>/documents.parquet`, drives
  * the REGISTERED query (same code path as Verify/Bench), and compares
  * against a direct Scala reimplementation of the spec — independent
  * of both Spark SQL and the DuckDB oracle. */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-textops-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Toy corpus with engineered chunk overlap: doc 3 repeats doc 1's
    * first 10-word chunk, doc 4 is a full copy of doc 2, doc 5 shares
    * nothing. Languages skewed for the mixing test. */
  private val corpus: Seq[(Long, String, String, String)] = {
    val c0 = (1 to 10).map(i => s"a$i").mkString(" ")   // chunk A
    val c1 = (1 to 10).map(i => s"b$i").mkString(" ")   // chunk B
    val c2 = (1 to 7).map(i => s"c$i").mkString(" ")    // short tail chunk
    Seq(
      (1L, s"$c0 $c1", "en", "s0"),        // chunks: A, B
      (2L, s"$c1 $c2", "en", "s1"),        // chunks: B(dup), C
      (3L, s"$c0 x1 x2 x3", "en", "s0"),   // chunks: A(dup), [x1 x2 x3]
      (4L, s"$c1 $c2", "de", "s1"),        // full copy of doc 2
      (5L, (1 to 25).map(i => s"z$i").mkString(" "), "de", "s2"),
      (6L, "solo words only here", "fr", "s2"))
  }

  private def writeCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("textops").toString
    import spark.implicits._
    corpus.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def chunksOf(text: String): Seq[String] =
    text.split(" ").grouped(10).map(_.mkString(" ")).toSeq

  test("q18_line_dedup matches a direct first-occurrence computation") {
    val dir = writeCorpus()
    val got = SparkEntry.queries("q18_line_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // brute force: first occurrence = lowest (doc_id, chunk index)
    val all = corpus.flatMap { case (id, text, _, _) =>
      chunksOf(text).zipWithIndex.map { case (c, ci) => (id, ci, c) }
    }
    val firstOf = all.groupBy(_._3).map { case (c, occ) =>
      c -> occ.map(o => (o._1, o._2)).min
    }
    val expected = corpus.map { case (id, text, _, _) =>
      val cs = chunksOf(text).zipWithIndex
      (id, cs.size.toLong,
        cs.count { case (c, ci) => firstOf(c) == ((id, ci)) }.toLong)
    }
    assert(got == expected)
    // every distinct chunk survives exactly once corpus-wide
    assert(expected.map(_._3).sum == firstOf.size.toLong)
  }

  test("q18_domain_mix matches the integer keep rule per language") {
    val dir = writeCorpus()
    val got = SparkEntry.queries("q18_domain_mix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    val byLang = corpus.groupBy(_._3).view.mapValues(_.map(_._1)).toMap
    val nMin = byLang.values.map(_.size).min.toLong
    val expected = byLang.toSeq.sortBy(_._1).map { case (lang, ids) =>
      val n = ids.size.toLong
      val kept = ids.count { id =>
        val hv = (id * 2654435761L) % 1048576L
        hv * hv * n < nMin * 1099511627776L
      }
      (lang, n, kept.toLong)
    }
    assert(got == expected)
  }

  test("q18_upsample emits exactly ceil(n_max/n)-capped copies per probe doc") {
    val dir = writeCorpus()
    // probe filter is doc_id % 50 == 0 — widen the corpus so doc 0
    // and 50 exist with different languages
    import spark.implicits._
    val wide = corpus ++ Seq(
      (0L, "zero doc words here now", "en", "s0"),
      (50L, "fifty doc words here now", "fr", "s1"))
    wide.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q18_upsample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

    val byLang = wide.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nMax = byLang.values.max
    def rep(lang: String) = math.min(4L, (nMax + byLang(lang) - 1) / byLang(lang))
    val expected = wide.filter(_._1 % 50 == 0).sortBy(_._1).flatMap {
      case (id, _, lang, _) => (1L to rep(lang)).map(c => (id, c, lang, rep(lang)))
    }
    assert(got.toSeq == expected)
  }

  test("q18_bpe_pairs matches direct adjacent-pair counting") {
    val dir = writeCorpus()
    val got = SparkEntry.queries("q18_bpe_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val counts = corpus.flatMap(_._2.split(" "))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expected = counts.sortBy { case (p, n) => (-n, p) }.take(15)
    assert(got == expected)
  }

  test("q18_unigram_lp matches direct integer micro-nat surprisal sums") {
    val dir = writeCorpus()
    val got = SparkEntry.queries("q18_unigram_lp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val toks = corpus.map { case (id, text, _, _) => id -> text.split(" ").toSeq }
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = cnt.values.sum
    val sp = cnt.map { case (w, c) =>
      w -> math.round(1000000.0 * math.log(n.toDouble / c))
    }
    val expected = toks.map { case (id, ws) =>
      (id, ws.map(sp).sum, ws.size.toLong)
    }
    assert(got == expected)
  }
}
