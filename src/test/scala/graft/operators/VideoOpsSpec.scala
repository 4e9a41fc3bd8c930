package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks for the video-modality operators: the registered
  * query (same code path as Verify/Bench) runs the REAL JDK GIF
  * sequence encode → demux → per-frame pixel read; the spec recomputes
  * the expected signatures straight from the content-hash formula — so
  * any divergence in the container round trip (frame count, palette
  * color fidelity, middle-frame indexing) fails the comparison. Texts
  * span 1–5 KiB so the fixture GIFs really are MULTI-frame (nf up to
  * 6) and the middle-frame read exercises a frame other than 0. */
class VideoOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-video-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  // lengths stride across KiB boundaries: i%6 picks the frame count
  private val corpus: Seq[(Long, String, String, String)] =
    (1L to 300L).map { i =>
      val filler = ("word" + i + " ") * ((i % 6).toInt * 170)
      (i, s"video fixture doc $i $filler", "en", s"s${i % 3}")
    }

  private def writeCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("videoops").toString
    import spark.implicits._
    corpus.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  /** The fixture formula, independent of the GIF path: frame count
    * from byte length, frame-i color = (base + i*7919) mod 2^24. */
  private def sig(text: String): (Long, Int, Int) = {
    val bytes = text.getBytes("UTF-8")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    val nf = bytes.length / 1024 + 1
    val base = Integer.parseInt(hex.substring(2, 8), 16)
    (nf.toLong, base, (base + (nf / 2) * 7919) & 0xffffff)
  }

  test("q18_video_dedup matches a brute-force O(n²) pair scan") {
    val dir = writeCorpus()
    def ch(c: Int): (Int, Int, Int) = (c >> 16, (c >> 8) & 255, c & 255)
    val sigs = corpus.map { case (id, text, _, _) => id -> sig(text) }
    // the corpus must actually contain multi-frame videos whose middle
    // frame differs from frame 0, else the demux read is untested
    assert(sigs.exists { case (_, (nf, c0, cm)) => nf >= 3 && c0 != cm })
    val expected = (for {
      (a, (nfA, c0A, cmA)) <- sigs
      (b, (nfB, c0B, cmB)) <- sigs
      (r0A, g0A, b0A) = ch(c0A); (rmA, gmA, bmA) = ch(cmA)
      (r0B, g0B, b0B) = ch(c0B); (rmB, gmB, bmB) = ch(cmB)
      if a < b && nfA == nfB &&
        r0A / 64 == r0B / 64 && g0A / 64 == g0B / 64 && b0A / 64 == b0B / 64 &&
        rmA / 64 == rmB / 64 && gmA / 64 == gmB / 64 && bmA / 64 == bmB / 64
      dist = math.abs(r0A - r0B) + math.abs(g0A - g0B) + math.abs(b0A - b0B) +
        math.abs(rmA - rmB) + math.abs(gmA - gmB) + math.abs(bmA - bmB)
      if dist <= 192
    } yield (a, b, dist.toLong)).sorted
    val got = TextQueries.q18VideoDedup.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(expected.nonEmpty, "test corpus produced no dup pairs — weak test")
    assert(got == expected)
  }

  test("video signature cache: reps don't re-decode or grow the RDD registry") {
    val dir = writeCorpus()
    def live = spark.sparkContext.getPersistentRDDs.keySet
    val r1 = TextQueries.q18VideoDedup.build(spark, dir).count()
    val afterFirst = live
    for (_ <- 1 to 2)
      assert(TextQueries.q18VideoDedup.build(spark, dir).count() == r1)
    assert(live == afterFirst,
      s"video signature cache grew across reps: ${live -- afterFirst}")
  }
}
