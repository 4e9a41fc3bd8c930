package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The modality gates' measured over-drop rate
  * ([[NearDupStream.overDropReport]]): each gate drops on bucket
  * collision WITHOUT the batch operator's exact confirm (documented
  * lossy), so some quarantined assets are false positives the batch
  * resolver would re-admit. These specs drive one deterministic
  * probe batch ("probe-$i" texts — md5-derived signatures, identical
  * on every run) through each gate and pin the report against an
  * INDEPENDENT scala-side recomputation (bucket-min keep rule + the
  * modality's confirm threshold over collected features), asserting
  * the identity n_true_dup + n_over_dropped = n_quarantined and that
  * the fixture exercises BOTH outcomes (a report that can't see
  * over-drops couldn't size a re-adjudication pass).
  */
class QuarantineReportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-quarantine-report-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val tmpRoot = java.nio.file.Files.createTempDirectory("quarantine-report").toString
  private def tmp(name: String): String = s"$tmpRoot/$name"

  private def probeDocs: DataFrame = {
    import spark.implicits._
    (0 until 600).map(i => (i.toLong, s"probe-$i")).toDF("doc_id", "text")
  }

  /** Independent expectation: per bucket, the smallest asset_id is
    * kept; every other member is quarantined, and counts as a TRUE
    * dup iff its L1 distance to SOME kept asset in the bucket is
    * within the confirm threshold. Plain Scala over collected
    * features — none of the report's join/aggregate code. */
  private def expected(feats: DataFrame, sigCols: Seq[String], thresh: Long): (Long, Long, Long) = {
    val rows = feats.select(
      col("asset_id") +: col("bkt") +: sigCols.map(col): _*).collect()
      .map(r => (r.getLong(0), r.getString(1),
        sigCols.indices.map(i => r.getLong(2 + i)).toVector))
    val byBucket = rows.groupBy(_._2)
    val dropped = byBucket.values.flatMap { xs =>
      val minId = xs.map(_._1).min
      xs.filter(_._1 != minId)
    }.toVector
    val keptByBucket = byBucket.map { case (b, xs) =>
      val minId = xs.map(_._1).min
      b -> xs.filter(_._1 == minId).map(_._3)
    }
    val trueDups = dropped.count { case (_, b, sig) =>
      keptByBucket(b).exists(k =>
        sig.zip(k).map { case (a, c) => math.abs(a - c) }.sum <= thresh)
    }
    (dropped.size.toLong, trueDups.toLong, (dropped.size - trueDups).toLong)
  }

  private def rawAssets(d: DataFrame): DataFrame =
    d.select(col("doc_id").as("asset_id"), lit("x").as("kind"),
      col("text").cast("binary").as("bytes"))

  private def check(name: String,
      process: (DataFrame, Long, String, String, Option[String]) => Unit,
      report: (SparkSession, String, String) => DataFrame,
      features: DataFrame => DataFrame, sigCols: Seq[String], thresh: Long): Unit = {
    val indexDir = tmp(s"$name-index"); val keptDir = tmp(s"$name-kept")
    val quarDir = tmp(s"$name-quar")
    process(probeDocs, 0L, indexDir, keptDir, Some(quarDir))
    val (nq, td, od) = expected(features(rawAssets(probeDocs)), sigCols, thresh)
    // the documented expectation: the gate's lossiness is real on this
    // fixture — both confirmable dups and over-drops exist
    assert(td > 0, s"$name: fixture has no true dups — spec is vacuous")
    assert(od > 0, s"$name: fixture has no over-drops — spec is vacuous")
    val r = report(spark, quarDir, keptDir).collect()
    assert(r.length == 1)
    val row = r.head
    val got = (row.getAs[Long]("n_quarantined"), row.getAs[Long]("n_true_dup"),
      row.getAs[Long]("n_over_dropped"), row.getAs[Long]("over_drop_bp"))
    assert(got._1 == nq, s"$name n_quarantined: got ${got._1}, expected $nq")
    assert(got._2 == td, s"$name n_true_dup: got ${got._2}, expected $td")
    assert(got._3 == od, s"$name n_over_dropped: got ${got._3}, expected $od")
    assert(got._2 + got._3 == got._1)
    assert(got._4 == od * 10000L / nq, s"$name over_drop_bp")
  }

  test("image gate over-drop report matches the independent confirm recount") {
    check("img", ImageDupStream.processBatch, ImageDupStream.quarantineReport,
      graft.operators.TextQueries.imageFeatures, Seq("r", "g", "b"), 96L)
  }

  test("audio gate over-drop report matches the independent confirm recount") {
    check("wav", AudioDupStream.processBatch, AudioDupStream.quarantineReport,
      graft.operators.TextQueries.audioFeatures, Seq("peak"), 4000L)
  }

  test("video gate over-drop report matches the independent confirm recount") {
    check("vid", VideoDupStream.processBatch, VideoDupStream.quarantineReport,
      graft.operators.TextQueries.videoFeatures,
      Seq("r0", "g0", "b0", "rm", "gm", "bm"), 192L)
  }
}
