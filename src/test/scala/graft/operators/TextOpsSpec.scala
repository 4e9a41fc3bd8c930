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

  test("q18_bpe_merges matches a direct greedy BPE trainer, incl. odd identical runs") {
    // corpus engineered so a merged symbol participates in a LATER
    // merge (multi-char 'a' side) and an odd identical run exercises
    // greedy non-overlap: 'aaaaa' + (a,a) must yield [aa, aa, a]
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    import spark.implicits._
    val texts = Seq(
      (1L, "aaaaa ababab banana", "en", "s0"),
      (2L, "banana bandana aaaaa", "en", "s0"),
      (3L, "ababab ananas banana banana", "de", "s1"))
    texts.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q18_bpe_merges")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

    // direct trainer: vocab of (symbol list, count), k greedy rounds
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => w.map(_.toString).toVector -> o.size.toLong }
    def applyMerge(sy: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < sy.length) {
        if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) { out += (a + b); i += 2 }
        else { out += sy(i); i += 1 }
      }
      out.result()
    }
    val expected = (1 to TextQueries.BpeMergeRounds).map { step =>
      val pairs = vocab.toSeq.flatMap { case (sy, c) =>
        sy.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val ((a, b), n) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.toSeq.map { case (sy, c) => (applyMerge(sy, a, b), c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (step.toLong, a, b, n)
    }
    assert(got == expected)
    // the engineered corpus really does exercise a multi-char-symbol merge
    assert(expected.exists { case (_, a, b, _) => a.length > 1 || b.length > 1 })
  }

  test("q18_substring_dedup removes chunk-straddling passages line_dedup cannot") {
    val G = 15
    val passage = (1 to 20).map(i => s"p$i") // 20-word repeated passage
    val short = (1 to 15).map(i => s"q$i")   // exactly-G intra-doc repeat
    val solo = (1 to 25).map(i => s"z$i")
    val docsW: Seq[(Long, Seq[String])] = Seq(
      1L -> ((1 to 5).map(i => s"a$i") ++ passage ++ (1 to 5).map(i => s"b$i")),
      // the passage re-occurs at offset 7 — misaligned with every
      // 10-word chunk boundary, so line_dedup sees only novel chunks
      2L -> ((1 to 7).map(i => s"c$i") ++ passage ++ (1 to 3).map(i => s"d$i")),
      3L -> solo,
      4L -> solo, // full copy — everything covered, NULL kept_md5
      5L -> (short ++ Seq("mid1", "mid2") ++ short)) // intra-doc repeat
    val dir = java.nio.file.Files.createTempDirectory("subdedup").toString
    import spark.implicits._
    docsW.map { case (id, ws) => (id, ws.mkString(" "), "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    // brute force straight from the definition: a position is removed
    // iff some G-gram window covering it repeats corpus-wide and this
    // occurrence is not the corpus-wide first (lowest (doc_id, start))
    val grams = docsW.flatMap { case (id, ws) =>
      (0 to ws.length - G).map(i => (ws.slice(i, i + G), id, i))
    }
    val firstOf = grams.groupBy(_._1).map { case (g, occ) =>
      g -> (occ.map(o => (o._2, o._3)).min, occ.size)
    }
    val expected = docsW.map { case (id, ws) =>
      val flagged = (0 to ws.length - G).filter { i =>
        val (first, n) = firstOf(ws.slice(i, i + G))
        n > 1 && first != ((id, i))
      }.toSet
      val covered = ws.indices.filter(p =>
        (math.max(0, p - G + 1) to p).exists(flagged)).toSet
      val islands = covered.count(p => !covered(p - 1))
      val kept = ws.indices.filterNot(covered).map(ws)
      val md5 = if (kept.isEmpty) null
        else java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      (id, ws.length.toLong, covered.size.toLong, islands.toLong, md5)
    }
    val got = SparkEntry.queries("q18_substring_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) null else r.getString(4))).toSeq
    assert(got == expected)
    // the engineered corpus actually exercises every mode: doc 2 loses
    // exactly the 20-word passage, doc 4 is wiped, doc 5 loses its
    // intra-doc repeat, docs 1/3 are untouched
    val byId = expected.map(e => e._1 -> e).toMap
    assert(byId(1L)._3 == 0L && byId(3L)._3 == 0L)
    assert(byId(2L)._3 == 20L && byId(2L)._4 == 1L)
    assert(byId(4L)._3 == 25L && byId(4L)._5 == null)
    assert(byId(5L)._3 == 15L)
    // and the contrast that motivates the operator: line_dedup's fixed
    // 10-word chunks see doc 2's misaligned passage as all-novel
    val ld = SparkEntry.queries("q18_line_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ld(2L) == ((3L, 3L)), s"line_dedup unexpectedly caught the straddle: $ld")
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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q18_chunk matches direct W=32/S=24 sliding windows") {
    val dir = writeCorpus()
    val got = SparkEntry.queries("q18_chunk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq

    val expected = corpus.flatMap { case (id, text, _, _) =>
      val ws = text.split(" ", -1)
      (0L to (ws.length - 1) / 24).map { i =>
        val chunk = ws.slice((i * 24).toInt, math.min(i * 24 + 32, ws.length).toInt)
        (id, i, i * 24, chunk.length.toLong, md5Hex(chunk.mkString(" ")))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
    // doc 5 (25 words) must produce an overlapping second window of 1 token
    assert(expected.count(_._1 == 5L) == 2 && expected.filter(_._1 == 5L).last._4 == 1L)
  }

  test("q18_chunk_dedup reports exactly the cross-document repeated windows") {
    val dir = writeCorpus()
    val got = SparkEntry.queries("q18_chunk_dedup")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq

    val chunks = corpus.flatMap { case (id, text, _, _) =>
      val ws = text.split(" ", -1)
      (0L to (ws.length - 1) / 24).map { i =>
        val chunk = ws.slice((i * 24).toInt, math.min(i * 24 + 32, ws.length).toInt)
        (md5Hex(chunk.mkString(" ")), chunk.length.toLong, id)
      }
    }.filter(_._2 >= 16)
    val expected = chunks.groupBy(_._1)
      .filter { case (_, xs) => xs.map(_._3).distinct.size > 1 }
      .map { case (h, xs) =>
        (h, xs.map(_._2).min, xs.size.toLong, xs.map(_._3).distinct.size.toLong,
          xs.map(_._3).min, xs.map(_._3).max)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
    // docs 2 and 4 are full copies: their window collides; nothing else does
    assert(expected.map(e => (e._5, e._6)) == Seq((2L, 4L)))
  }

  test("q18_length_hist matches direct 64-token bucketing") {
    val dir = writeCorpus()
    val got = SparkEntry.queries("q18_length_hist")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq

    val expected = corpus
      .map { case (_, text, _, src) => src -> text.split(" ", -1).length.toLong }
      .groupBy { case (src, n) => (src, n / 64) }
      .map { case ((src, b), xs) =>
        val ns = xs.map(_._2)
        (src, b, ns.size.toLong, ns.sum, ns.min, ns.max)
      }.toSeq.sortBy(t => (t._1, t._2))
    assert(got == expected)
  }

  test("q18_wordpiece matches a direct greedy longest-match-first encoder") {
    // probe filter is doc_id % 25 == 0; word vocab needs count >= 16,
    // char vocab needs word count >= 2 — engineer all three: "hello"
    // repeated 16x lands in the word vocab, "he" (cnt 2) feeds chars
    // h/e, and "qz" appears once so q/z stay OUT of the char vocab
    // (every occurrence of q or z must count as UNK).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wp").toString
    val wp = Seq(
      (0L, (Seq.fill(16)("hello") ++ Seq("he", "he", "qz")).mkString(" ")),
      (25L, "hellohe heqz hello"),
      (7L, "hello hello")) // non-probe doc: feeds counts, not output
    wp.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q18_wordpiece")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // direct vocab: words cnt>=16 len<=12 (top 256) + chars of words cnt>=2
    val wc = wp.flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.size).toMap
    val topw = wc.filter { case (w, c) => w.length <= 12 && c >= 16 }.keys.toSet
    val chars = wc.filter(_._2 >= 2).keys.flatMap(_.map(_.toString)).toSet
    val vocab = topw ++ chars
    def encode(w: String): (Long, Long) = { // (pieces, unks)
      var pos = 0; var np = 0L; var nu = 0L
      while (pos < w.length) {
        val m = (1 to (w.length - pos)).filter(l => vocab(w.substring(pos, pos + l)))
          .sorted.lastOption.getOrElse(0)
        np += 1; if (m == 0) nu += 1
        pos += math.max(m, 1)
      }
      (np, nu)
    }
    val expected = wp.filter(_._1 % 25 == 0).map { case (id, text) =>
      val ws = text.split(" ").filter(w => w.nonEmpty && w.length <= 24)
      val enc = ws.map(encode)
      (id, ws.length.toLong, enc.map(_._1).sum, enc.map(_._2).sum)
    }.sortBy(_._1)
    assert(got == expected)
    // the engineered UNKs are real: q/z chars outside the vocab
    assert(expected.map(_._4).sum > 0)
    // and hello is one piece, not 5 chars: doc 7 excluded, doc 0 has
    // 16 hellos + 2 he + qz = 19 words
    assert(expected.head._2 == 19L)
  }
}
