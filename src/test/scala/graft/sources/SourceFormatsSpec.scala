package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The batch source surface beyond parquet: ORC, CSV, and JSON-lines
  * round-trip the documents table bit-for-bit through `spark.read`/
  * `spark.write`, and the columnar path (ORC) keeps the two scan
  * properties the 100 TB story depends on — predicate pushdown and
  * column pruning — exactly as the parquet scans PLANS_r* audit.
  * (Avro is a scoped-out wire format here: the spark-avro DataSource
  * jar does not ship in /opt/spark/jars, the same in-container class
  * as the Kafka connector.) */
class SourceFormatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sourceformats-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"), col("source"))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("doc_id")).collect().toSeq

  test("ORC, CSV and JSON-lines round-trip the documents table identically") {
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val want = sortedRows(docs)

    docs.write.mode(SaveMode.Overwrite).orc(s"$dir/docs_orc")
    assert(sortedRows(spark.read.orc(s"$dir/docs_orc")) == want)

    // CSV needs explicit types back (schema-on-read) and quote-safe text
    docs.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("quoteAll", "true").csv(s"$dir/docs_csv")
    val csvBack = spark.read.option("header", "true").schema(docs.schema)
      .csv(s"$dir/docs_csv")
    assert(sortedRows(csvBack) == want)

    docs.write.mode(SaveMode.Overwrite).json(s"$dir/docs_json")
    val jsonBack = spark.read.schema(docs.schema).json(s"$dir/docs_json")
    assert(sortedRows(jsonBack) == want)
  }

  test("the ORC scan pushes predicates and prunes columns like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-orc").toString
    docs.write.mode(SaveMode.Overwrite).orc(s"$dir/docs_orc")
    val q = spark.read.orc(s"$dir/docs_orc")
      .where(col("doc_id") > 100).select(col("doc_id"), col("lang"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata.get("PushedFilters").exists(_.contains("GreaterThan(doc_id,100)")),
      s"no pushed filter in ${scan.metadata}")
    assert(scan.schema.fieldNames.toSet == Set("doc_id", "lang"),
      s"scan did not prune to the projection: ${scan.schema.fieldNames.mkString(",")}")
  }
}
