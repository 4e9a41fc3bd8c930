package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-variant invariants for the curation batch that the per-query
  * DuckDB oracle can't express (it checks each query alone). */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-curation-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("bloom-gated decontamination is row-identical to the exact join") {
    // the bloom pre-filter may only DROP rows the exact join would also
    // drop — a false negative here silently un-flags contaminated docs
    val exact = TextQueries.q18Contamination.build(spark, sfDir).collect()
    val bloom = CurationQueries.q18DecontamBloom.build(spark, sfDir).collect()
    assert(exact.toSeq == bloom.toSeq)
  }

  test("semdedup never drops a cluster's lowest-id vector") {
    // the keep rule is min-id-wins inside each cluster, so first_kept
    // must equal the cluster min and n_dropped stay strictly below n_vecs
    val rows = CurationQueries.q18Semdedup.build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      val d = r.getAs[Long]("n_dropped")
      assert(d >= 0 && d < n, s"cluster ${r.get(0)}: dropped $d of $n")
      assert(r.getAs[Long]("first_kept") >= 0)
    }
  }
}
