package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q18_minhash_quality invariants on the real sf0.001 corpus: the
  * evaluated pair set is EXACTLY the registered LSH candidate set
  * (q18_minhash_pairs on the same corpus), the estimate is the 1250 bp
  * quantization an 8-slot signature implies, and err_bp is the honest
  * |est − exact| under integer arithmetic. */
class MinhashQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-minhashquality-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("pair set equals the registered candidate generator; bp fields are coherent") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q18_minhash_quality")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val evaluated = rows.map(r => (r._1, r._2)).toSet
    val registered = SparkEntry.queries("q18_minhash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(evaluated == registered, "quality rows must cover exactly the LSH candidates")
    rows.foreach { case (a, b, nMatch, est, exact, err) =>
      assert(a < b)
      assert(nMatch >= 1 && nMatch <= 8, s"($a,$b): candidates share >= 1 band => >= 1 slot")
      assert(est == nMatch * 1250)
      assert(exact >= 0 && exact <= 10000)
      assert(err == math.abs(est - exact))
    }
  }

  test("simhash quality pair set equals the registered hamming<=2 pairs; lookup coherent") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q18_simhash_quality")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val registered = SparkEntry.queries("q18_simhash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == registered)
    val lookup = Map(0L -> 10000L, 1L -> 9952L, 2L -> 9808L)
    rows.foreach { case (a, b, h, est, exact, err) =>
      assert(a < b && h >= 0 && h <= 2)
      assert(est == lookup(h))
      assert(exact >= 0 && exact <= 10000)
      assert(err == math.abs(est - exact))
    }
  }
}
