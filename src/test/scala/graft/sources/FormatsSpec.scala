package graft.sources

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Source-format round-trips (SURVEY §2.1: the reference's JsonSource
  * consumes line-delimited JSON files; this engine reads any Spark
  * batch format through the same table layer). Each format writes the
  * sf0.001 lineitem slice and must read back cell-identical —
  * timestamps travel as epoch-micros BIGINT, the engine's wire rule,
  * so csv/json text round-trips carry no timestamp-format ambiguity. */
class FormatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-formats-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("csv, jsonl, and orc round-trip the lineitem slice losslessly") {
    val src = Envelope.readTable(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        // exact decimal → integer cents: the text formats must not be
        // asked to round-trip raw doubles textually
        expr("CAST(round(CAST(l_quantity AS DECIMAL(20,4)) * 100, 0) AS BIGINT)")
          .as("qty_c"),
        col("l_returnflag"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
    val expected = canon(src)
    assert(expected.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("formats").toString
    src.write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/csv")
    src.write.mode(SaveMode.Overwrite).json(s"$dir/json")
    src.write.mode(SaveMode.Overwrite).orc(s"$dir/orc")

    val csv = spark.read.schema(src.schema).option("header", "true").csv(s"$dir/csv")
    val json = spark.read.schema(src.schema).json(s"$dir/json")
    val orc = spark.read.orc(s"$dir/orc")
    assert(canon(csv) == expected, "csv")
    assert(canon(json) == expected, "jsonl")
    assert(canon(orc) == expected, "orc")
  }
}
