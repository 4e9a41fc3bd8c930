package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end extensions check: a session configured with
  * spark.sql.extensions=graft.GraftExtensions can call the engine's
  * functions from SQL with no registration calls. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers deflate/inflate for plain SQL") {
    // must own session creation: stop anything the harness left active
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val out = spark.sql(
        "SELECT CAST(inflate(deflate(CAST('payload-123' AS BINARY))) AS STRING) AS s")
        .as[String].head()
      assert(out == "payload-123")
      val dot = spark.sql(
        "SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .as[Long].head()
      assert(dot == 32L)
    } finally spark.stop()
  }
}
