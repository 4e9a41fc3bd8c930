package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q18_fuzzy_contam: minhash-LSH fuzzy decontamination of the train
  * split against the eval holdout (doc_id % 10 = 3, the
  * q18_contamination convention).
  *
  * Pins (1) the flag semantics on an engineered corpus — a train doc
  * that is a lightly-EDITED copy of an eval doc (no shared 8-gram run
  * long enough for the exact pass to be the only catcher, Jaccard
  * ≥ 70%) is flagged, an unrelated train doc is not, and two
  * near-identical TRAIN docs are not (contamination is train×eval
  * only); (2) every reported jac_bp equals the brute-force 3-gram
  * Jaccard; (3) on the real sf0.001 corpus the candidate set is
  * LSH-bounded: flagged pairs ⊆ the band-collision pairs of
  * q18_minhash_pairs restricted to the split boundary.
  */
class FuzzyContamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-fuzzy-contam-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def jaccardBp(a: String, b: String): Long = {
    def sh(t: String) =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    if (sa.isEmpty || sb.isEmpty) 0L
    else 10000L * (sa & sb).size / (sa | sb).size
  }

  test("edited eval copy in train is flagged; unrelated and train-train near-dups are not") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // eval doc 13 (13 % 10 == 3); train doc 20 = the same text with one
    // word substituted mid-stream — a paraphrase-grade leak
    val edited = base.replace("w20", "zz")
    // train docs 30/31: near-identical to EACH OTHER but unlike eval
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val other2 = other.replace("v120", "qq")
    val dir = java.nio.file.Files.createTempDirectory("fuzzy-contam").toString
    Seq(
      (13L, "evalset", base),
      (20L, "web", edited),
      (30L, "web", other),
      (31L, "web", other2),
      (42L, "web", (200 to 240).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q18_fuzzy_contam")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    assert(got.contains((20L, 13L)), s"edited eval copy must be flagged; got $got")
    assert(got((20L, 13L)) == jaccardBp(base, edited))
    assert(got((20L, 13L)) >= 7000)
    assert(!got.keySet.exists { case (t, e) => t == 42L || e == 42L },
      "unrelated train doc must not be flagged")
    assert(!got.keySet.exists { case (t, e) => Set(t, e) == Set(30L, 31L) },
      "train-train near-dups are dedup's business, not contamination's")
  }

  test("real corpus: reported values are exact Jaccard and pairs respect the split") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q18_fuzzy_contam")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    got.foreach { case ((t, e), bp) =>
      assert(t % 10 != 3 && e % 10 == 3, s"pair ($t,$e) violates the split")
      assert(bp == jaccardBp(texts(t), texts(e)), s"pair ($t,$e) bp mismatch")
      assert(bp >= 7000)
    }
    // the fuzzy pass must be a superset-or-equal catcher of verbatim
    // cross-split duplicates: any train doc with text IDENTICAL to an
    // eval doc must appear
    val byText = texts.toSeq.groupBy(_._2).values.filter(_.size > 1)
    val verbatim = for {
      g <- byText
      e <- g.collect { case (id, _) if id % 10 == 3 => id }
      t <- g.collect { case (id, _) if id % 10 != 3 => id }
    } yield (t, e)
    verbatim.foreach { p =>
      assert(got.toMap.contains(p), s"verbatim cross-split dup $p missed")
    }
  }
}
