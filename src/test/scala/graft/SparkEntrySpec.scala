package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract: `entry` must return rows on sf0.001 (the
  * driver's smoke check), every registry name must be unique, and
  * every oracle key must name a registered query — pinned locally so
  * a registry regression can never reach the driver first. */
class SparkEntrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-entry-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("registry names are unique and every oracle key is a registered query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
    assert(SparkEntry.queries.size >= 118, "query surface must not shrink")
  }
}
