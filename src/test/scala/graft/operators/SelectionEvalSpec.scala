package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Direct-reimplementation specs for the round-11 selection/eval
  * additions: token-budget selection, per-source KL drift, winnowing
  * fingerprints, and kNN label classification. Each test recomputes
  * the expected answer brute-force in Scala on an engineered corpus
  * (the TextOpsSpec discipline) — the oracle run checks cross-engine
  * agreement, these check the SEMANTICS against first principles.
  */
class SelectionEvalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-seleval-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("seleval").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q18_token_budget ----

  test("token_budget keeps the best-score prefix and cuts INSIDE a tied score group") {
    // three docs tie at score 10000 (4 unique tokens each); total = 100
    // tokens → budget 10, which fits docs 1+2 (cum 8) but not doc 3
    // (cum 12) — the cut lands INSIDE the tied score group, so the
    // doc_id tie-break decides survival
    val rows = Seq(
      (1L, (1 to 4).map(i => s"u$i").mkString(" "), "en", "s0"),
      (2L, (5 to 8).map(i => s"u$i").mkString(" "), "en", "s0"),
      (3L, (9 to 12).map(i => s"u$i").mkString(" "), "en", "s1"),
      (4L, (1 to 22).flatMap(i => Seq(s"h$i", s"h$i")).mkString(" "), "en", "s1"), // 22/44 → 5000
      (5L, (1 to 44).map(_ => "x").mkString(" "), "en", "s2"))    // 1/44 → 227
    val dir = writeDocs(rows)
    val got = SparkEntry.queries("q18_token_budget")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // brute force: global order (score desc, doc_id), running sum ≤ total/10
    val t = rows.map { case (id, text, _, _) =>
      val ws = text.split(" ")
      (id, ws.length.toLong, 10000L * ws.distinct.length / ws.length)
    }
    val budget = t.map(_._2).sum / 10
    assert(budget == 10L)
    var cum = 0L
    val expected = t.sortBy { case (id, _, s) => (-s, id) }.flatMap { case (id, n, s) =>
      cum += n
      if (cum <= budget) Some((id, s, n, cum)) else None
    }
    assert(got == expected)
    assert(got.nonEmpty && got.size < rows.size) // the cut actually cut
  }

  // ---- q18_source_kl ----

  test("source_kl is small for pool-aligned sources and large for a disjoint one") {
    val common = (1 to 10).map(i => s"c$i").mkString(" ")
    val rows = Seq(
      (1L, common, "en", "sA"), (2L, common, "en", "sA"),
      (3L, common, "en", "sB"), // sB looks exactly like the pool mix of sA+sB
      (4L, (1 to 10).map(i => s"z$i").mkString(" "), "en", "sC")) // disjoint vocab
    val dir = writeDocs(rows)
    val got = SparkEntry.queries("q18_source_kl")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // brute force with the exact integer-micro-nat rounding
    val tok = rows.flatMap { case (_, text, _, src) => text.split(" ").map(src -> _) }
    val sw = tok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw = tok.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ns = tok.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = tok.size.toLong
    val expected = ns.keys.toSeq.sorted.map { src =>
      val sum = sw.collect { case ((s, w), tf) if s == src =>
        tf * math.round(1e6 * math.log((tf.toDouble * n) / (ns(src).toDouble * cw(w))))
      }.sum
      (src, ns(src), sum, sum / ns(src))
    }
    assert(got == expected)
    val klBySrc = got.map(g => g._1 -> g._4).toMap
    // Gibbs: every per-source KL vs the pool is non-negative
    assert(klBySrc.values.forall(_ >= 0L))
    // sA/sB share the pool's dominant vocab (mild drift: the pool also
    // carries sC's tokens); sC's vocab is DISJOINT → much larger drift
    assert(klBySrc("sC") > 4 * klBySrc("sA") && klBySrc("sC") > 4 * klBySrc("sB"))
  }

  // ---- q18_winnow ----

  test("winnow matches brute-force selection and shared runs share a fingerprint") {
    val shared = (1 to 9).map(i => s"s$i").mkString(" ") // 9-word run ≥ k+w-1=8 → must share
    val rows = Seq(
      (1L, s"$shared alpha beta gamma delta epsilon", "en", "s0"),
      (2L, s"pre1 pre2 pre3 $shared tail1 tail2", "en", "s0"),
      (3L, (1 to 12).map(i => s"q$i").mkString(" "), "en", "s1"),
      (4L, "too short for window", "en", "s1")) // 4 words → 1 kgram < 5 → absent
    val dir = writeDocs(rows)
    val got = SparkEntry.queries("q18_winnow")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

    def winnowOf(text: String): (Long, Seq[String]) = {
      val ws = text.split(" ")
      val kgrams = ws.sliding(4).map(_.mkString(" ")).toVector
      val keys = kgrams.zipWithIndex.map { case (g, i) => md5Hex(g) + "#" + f"${i + 1}%08d" }
      val sel = (0 to keys.size - 5).map(j => keys.slice(j, j + 5).min).distinct
      (kgrams.size.toLong, sel.map(_.take(32)).distinct)
    }
    val expected = rows.flatMap { case (id, text, _, _) =>
      val (nk, fps) = winnowOf(text)
      if (nk < 5) None
      else Some((id, nk, fps.size.toLong, md5Hex(fps.sorted.mkString(" "))))
    }
    assert(got == expected)
    assert(!got.exists(_._1 == 4L)) // sub-window doc absent
    // guarantee: docs 1 and 2 share the 9-word run → at least one common fingerprint
    val fp1 = winnowOf(rows(0)._2)._2.toSet
    val fp2 = winnowOf(rows(1)._2)._2.toSet
    assert((fp1 & fp2).nonEmpty)
  }

  // ---- q18_triangles ----

  test("triangles: a 4-doc duplicate clique yields 3 per member; chains yield none") {
    val quad = (1 to 30).map(i => s"d$i").mkString(" ")
    val rows = Seq(
      (1L, quad, "en", "s0"), (2L, quad, "en", "s0"),
      (3L, quad, "en", "s1"), (4L, quad, "en", "s1"), // K4 clique
      (5L, (1 to 30).map(i => s"x$i").mkString(" "), "en", "s2"),
      (6L, (1 to 30).map(i => s"y$i").mkString(" "), "en", "s2"))
    val dir = writeDocs(rows)
    val got = SparkEntry.queries("q18_triangles")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // brute force from the REGISTERED candidate pairs (same frame the
    // query consumes): close every wedge
    val pairs = SparkEntry.queries("q18_minhash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && pairs((a, b))
      c <- nodes if b < c && pairs((b, c)) && pairs((a, c))
    } yield (a, b, c)
    val expected = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (id, xs) => (id, xs.size.toLong) }
      .toSeq.sorted
    assert(got == expected)
    // identical texts form a K4: every member closes C(3,2) = 3 triangles
    assert(got.filter(_._1 <= 4L).map(_._2) == Seq(3L, 3L, 3L, 3L))
    assert(!got.exists(g => g._1 == 5L || g._1 == 6L))
  }

  // ---- q18_knn_classify ----

  test("knn_classify scores clean clusters 100% and a poisoned probe 0%") {
    val dir = java.nio.file.Files.createTempDirectory("seleval-knn").toString
    import spark.implicits._
    // 3 orthogonal clusters of 10 (labels 0/1/2 at dims 0/1/2); probes
    // are vec_id % 10 == 0 → one per label. Probe 20 is POISONED into
    // cluster 0, so label 2's accuracy must read 0.
    val rows = (0 until 30).map { i =>
      val label = i / 10
      val axis = if (i == 20) 0 else label
      val v = Array.tabulate(8)(d => if (d == axis) 1.0f else 0.001f * ((i * 7 + d) % 5))
      (i.toLong, v, label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q18_knn_classify")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 1L, 1L, 10000L), (1L, 1L, 1L, 10000L), (2L, 1L, 0L, 0L)))
  }
}
