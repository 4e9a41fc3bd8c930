package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q18_containment against a driver-side brute-force ground truth on
  * the real sf0.001 corpus: every reported (pair, sz_a, sz_b, both_n,
  * cont_bp) must equal the direct shingle-set computation, and — the
  * recall fact for THIS fixture — rare-shingle blocking must surface
  * every all-pairs containment ≥ 8000 bp (blocked recall is not 1.0
  * in general; here every contained doc keeps at least one low-DF
  * shingle its container shares, and the spec would catch a blocking
  * change that starts dropping real pairs). Also pins the asymmetry
  * rationale: the fixture holds pairs whose containment clears the
  * gate while their Jaccard would not (|A∩B|/min ≫ |A∩B|/|A∪B|). */
class ContainmentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-containment-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def shingleSets(dir: String): Map[Long, Set[String]] = {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.map { case (id, t) =>
      val ws = t.split(" ")
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
  }

  test("reported pairs match brute force exactly; fixture recall is total") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q18_containment")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.nonEmpty)

    val sets = shingleSets(dir)
    val ids = sets.keys.toVector.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      sa = sets(a); sb = sets(b)
      if sa.nonEmpty && sb.nonEmpty
      both = (sa & sb).size.toLong
      cont = 10000L * both / math.min(sa.size, sb.size)
      if cont >= 8000
    } yield (a, b) -> (sa.size.toLong, sb.size.toLong, both, cont)).toMap

    assert(got.keySet == brute.keySet,
      s"blocked pairs must equal brute-force pairs on this fixture; " +
        s"missing=${(brute.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- brute.keySet).take(5)}")
    got.foreach { case (k, v) => assert(v == brute(k), s"pair $k mismatch") }
  }

  test("containment catches inclusion that Jaccard misses") {
    // doc 1 is verbatim-contained in doc 2 (a 10×-longer wrapper) —
    // the duplication mode LSH-on-Jaccard structurally misses: the
    // pair's Jaccard is ~12%, far below any near-dup gate, while its
    // containment is 10000 bp. Rare-shingle blocking must still pair
    // them: every shingle of the contained doc has DF ≥ 2 (its
    // container holds it too).
    import org.apache.spark.sql.SaveMode
    val small = (1 to 30).map(i => s"w$i").mkString(" ")
    val wrapper = small + " " + (1 to 200).map(i => s"pad$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("containment").toString
    import spark.implicits._
    Seq(
      (1L, small, "en", "s0"),
      (2L, wrapper, "en", "s1"),
      (3L, (1 to 40).map(i => s"q$i").mkString(" "), "en", "s2"),
      (4L, (1 to 40).map(i => s"r$i").mkString(" "), "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q18_containment")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.keySet == Set((1L, 2L)))
    val (sza, szb, both, cont) = rows((1L, 2L))
    assert(sza == 28 && both == 28 && cont == 10000L)
    assert(10000L * both / (sza + szb - both) < 8000,
      "the pair must NOT be a Jaccard near-dup — that asymmetry is the point")
  }

  test("dup_stats arithmetic is consistent with the registered cc clusters") {
    val dir = "/root/testdata/sf0.001"
    val stats = SparkEntry.queries("q18_dup_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clusters = SparkEntry.queries("q18_cc_dedup")(spark, dir)
      .collect().map(r => r.getLong(1))
    val total = spark.read.parquet(s"$dir/documents.parquet").count() +
      spark.read.parquet(s"$dir/documents.parquet")
        .where("doc_id % 10 = 0").count()

    // one histogram row per distinct cluster size, plus the singleton row
    val bySize = clusters.groupBy(identity).map { case (s, xs) => (s, xs.length.toLong) }
    stats.filter(_._1 > 1).foreach { case (size, n, removed) =>
      assert(bySize(size) == n, s"size-$size cluster count")
      assert(removed == n * (size - 1), s"size-$size removal arithmetic")
    }
    val singles = stats.find(_._1 == 1L).get
    assert(singles._2 == total - clusters.sum, "singleton row = corpus minus clustered docs")
    assert(singles._3 == 0L)
    // total docs are conserved: singletons + clustered = corpus
    assert(stats.map(s => s._1 * s._2).sum == total)
  }
}
