package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Completeness/soundness property for the 2-of-4 simhash blocking:
  * on crafted signatures the blocked pair set must equal the
  * brute-force set of hamming≤2 pairs EXACTLY. The DuckDB oracle
  * cannot catch a blocking hole (both engines would miss the same
  * pairs if they shared the scheme), so this property is the Spark
  * side's own guarantee, driven with adversarial flips: every
  * 1-bit and a spread of 2-bit and 3-bit variants of shared bases.
  */
class SimhashBlockingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-simhash-blocking-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("blocked pairs == brute-force hamming<=2 pairs on adversarial flips") {
    val rnd = new scala.util.Random(42)
    val bases = Seq.fill(6)(rnd.nextLong() & 0xFFFFFFFFL)
    val sigs = scala.collection.mutable.ArrayBuffer[Long]()
    for (base <- bases) {
      sigs += base
      // all 32 single-bit flips: every hamming-1 pair with the base,
      // and hamming-2 pairs among themselves
      for (i <- 0 until 32) sigs += base ^ (1L << i)
      // 2-bit and 3-bit flips (3-bit must NOT pair with the base)
      for (_ <- 0 until 16) {
        val i = rnd.nextInt(32); val j = rnd.nextInt(32); val k = rnd.nextInt(32)
        sigs += base ^ (1L << i) ^ (1L << j)
        sigs += base ^ (1L << i) ^ (1L << j) ^ (1L << k)
      }
      // unrelated noise
      for (_ <- 0 until 8) sigs += rnd.nextLong() & 0xFFFFFFFFL
    }
    val rows = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSeq

    val expected = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= 2
    } yield (a._1, b._1, java.lang.Long.bitCount(a._2 ^ b._2))).toSet

    import spark.implicits._
    val got = SimilarityQueries.simhashPairsFromSigs(
      rows.toDF("doc_id", "sig"))
      .as[(Long, Long, Int)].collect().toSet

    assert(got == expected,
      s"blocked=${got.size} brute=${expected.size} " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // sanity: the crafted set actually exercises the property
    assert(expected.size > 3000)
  }
}
