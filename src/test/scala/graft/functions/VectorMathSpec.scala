package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class VectorMathSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-vectormath-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("dotLong: codegen integer dot product matches a reference fold") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rng.nextLong() % 1000000L),
      Array.fill(64)(rng.nextLong() % 1000000L)))
    val expected = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum }
    val got = rows.toDF("a", "b")
      .select(VectorMath.dotLong(col("a"), col("b")).as("dot"))
      .as[Long].collect().toSeq
    assert(got == expected)
  }

  test("dotLong: null array yields null; SQL registration works") {
    import spark.implicits._
    VectorMath.register(spark)
    val df = Seq(
      (Some(Array(1L, 2L, 3L)), Some(Array(4L, 5L, 6L))),
      (None, Some(Array(1L)))).toDF("a", "b")
    val viaSql = df.selectExpr("dot_long(a, b) AS dot")
      .as[Option[Long]].collect().toList
    assert(viaSql == List(Some(32L), None))
  }

  test("nearestCodes: argmin matches brute force; ties go to the smallest id") {
    import spark.implicits._
    // 4 codewords of dim 4 (2 subs × 2); codewords 10 and 20 are
    // IDENTICAL so any vector equidistant to both must pick id 10
    val cls = Array(10L, 20L, 30L, 40L)
    val flat = Array[Long](
      1, 1, 5, 5, /* cl 10 */ 1, 1, 5, 5, /* cl 20 (same) */
      0, 0, 0, 0, /* cl 30 */ 9, 9, 9, 9 /* cl 40 */)
    val rows = Seq(Array(1L, 1L, 5L, 5L), Array(0L, 0L, 9L, 9L), Array(2L, 2L, 4L, 4L))
    val got = rows.toDF("q")
      .select(VectorMath.nearestCodes(col("q"), flat, cls, 2, 2).as("nc"))
      .as[Array[Long]].collect().toSeq
    def brute(q: Array[Long], s: Int): (Long, Long) =
      cls.zipWithIndex.map { case (cl, k) =>
        val d = (0 until 2).map(j =>
          (q(s * 2 + j) - flat(k * 4 + s * 2 + j)) match { case x => x * x }).sum
        (d, cl)
      }.min match { case (d, cl) => (cl, d) }
    for ((q, nc) <- rows.zip(got); s <- 0 until 2) {
      val (cl, d) = brute(q, s)
      assert(nc(2 * s) == cl && nc(2 * s + 1) == d, s"row $q sub $s")
    }
    // the tie case explicitly: q == codeword 10 == codeword 20
    assert(got.head.toSeq == Seq(10L, 0L, 10L, 0L))
  }

  test("nearestCodes: a short input vector is zero-padded (oracle n2-2dot+cn2)") {
    import spark.implicits._
    val cls = Array(1L, 2L)
    val flat = Array[Long](3, 3, 3, 3, /* cl 1 */ 0, 0, 0, 0 /* cl 2 */)
    // q has 3 of 4 components: sub 1 pairs q(2) and zero-pads index 3,
    // so the codeword tail contributes c_3² — exactly the SQL oracle's
    // n2 − 2·dot_long(min-bounded) + cn2 on a ragged row
    val got = Seq(Array(0L, 0L, 3L)).toDF("q")
      .select(VectorMath.nearestCodes(col("q"), flat, cls, 2, 2).as("nc"))
      .as[Array[Long]].head().toSeq
    // sub 0: dists (18, 0) -> cl 2
    // sub 1: cl1 = (3-3)² + 3² = 9, cl2 = 3² + 0² = 9 -> tie -> cl 1
    assert(got == Seq(2L, 0L, 1L, 9L))
  }

  test("quantize: fixed-points each component like the SQL formulation") {
    import spark.implicits._
    val vecs = Seq(Array(0.1234567f, -0.9876543f, 0f, 1f))
    val viaHelper = vecs.toDF("v")
      .select(VectorMath.quantize(col("v")).as("q")).as[Array[Long]].head()
    val viaExpr = vecs.toDF("v")
      .selectExpr(
        "transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q")
      .as[Array[Long]].head()
    assert(viaHelper.toSeq == viaExpr.toSeq)
    assert(viaHelper.toSeq == Seq(123457L, -987654L, 0L, 1000000L))
  }
}
