package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins ScaleOps.wideRead's contract: it is a NO-OP on well-split
  * data (the production case — the copy machinery must never fire on
  * a properly laid-out table), and on the degenerate single-row-group
  * layout it yields a row-identical, wider read whose copy is shared
  * across calls.
  */
class WideReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-wideread-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def mkDir(): String =
    java.nio.file.Files.createTempDirectory("wideread").toString

  test("well-split input is returned untouched - no copy is materialized") {
    import spark.implicits._
    val dir = mkDir()
    // 8 files ≥ defaultParallelism(4) splits - the production layout
    (0 until 4000).map(i => (i.toLong, s"w$i")).toDF("id", "w")
      .repartition(8).write.parquet(s"$dir/documents.parquet")
    val before = System.currentTimeMillis()
    val df = ScaleOps.wideRead(spark, dir, "documents")
    assert(df.rdd.getNumPartitions >= 4)
    // the scan must still point at the SOURCE path, not a tmp copy
    val scanPaths = df.queryExecution.executedPlan.toString
    assert(scanPaths.contains("documents.parquet"), scanPaths.take(1500))
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val fresh = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft_wide") && f.lastModified() >= before)
    assert(fresh.isEmpty, s"unexpected copies: ${fresh.map(_.getName).toSeq}")
  }

  test("single-file input gets a wider, row-identical read; copy shared") {
    import spark.implicits._
    val dir = mkDir()
    val data = (0 until 5000).map(i => (i.toLong, s"t$i"))
    data.map(identity).toDF("id", "w")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    assert(raw.rdd.getNumPartitions < 4) // the degenerate layout
    val wide = ScaleOps.wideRead(spark, dir, "documents")
    assert(wide.rdd.getNumPartitions >= 4)
    assert(wide.count() == 5000L)
    // row-identical to the raw table
    assert(wide.except(raw).isEmpty && raw.except(wide).isEmpty)
    // second call returns the session-cached read (same plan object)
    assert(ScaleOps.wideRead(spark, dir, "documents") eq wide)
  }
}
