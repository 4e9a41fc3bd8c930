package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-independence net: the engine's standing claim is that
  * every aggregate is order-exact (integer/decimal accumulation,
  * per-entry float rounding) so results are bit-identical under ANY
  * partitioning or AQE re-plan. This spec re-runs the queries whose
  * naive formulations WOULD be float-order-sensitive under two very
  * different shuffle widths and asserts identical rows — the
  * regression net for someone reintroducing a bare float sum.
  */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  // the queries with micro-quantized / power-sum / hash-sampled cores
  private val sensitive = Seq(
    "q18_unigram_lp", "q18_bigram_lp", "q18_bm25", "q18_dsir",
    "q18_nb_langid", "q12_outliers", "q12_stats", "q18_weighted_sample",
    "q18_kmeans", "q18_semdedup", "q20_dpp", "q18_ann_ivfpq",
    "q18_quality_calib", "q18_novelty", "q12_mad_outliers", "q18_pq_sampled")

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-determinism-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("float-sensitive queries are bit-identical at shuffle widths 1 and 7") {
    sensitive.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val narrow = fn(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val wide = fn(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(narrow == wide, s"$name differs across shuffle widths")
      assert(narrow.nonEmpty, s"$name returned no rows")
    }
  }

  test("AQE on/off never changes results (re-plan-proof aggregates)") {
    // AQE coalesces partitions and may swap join strategies at runtime;
    // integer/decimal accumulation must make that invisible
    Seq("q18_unigram_lp", "q12_outliers", "q18_dsir", "q18_kmeans",
      "q20_salted_skew_agg").foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val withAqe = fn(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val without = fn(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(withAqe == without, s"$name differs under AQE toggle")
    }
  }
}
