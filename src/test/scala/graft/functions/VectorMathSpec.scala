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
