package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming HLL distinct-count gate must converge to EXACTLY the
  * batch estimator's integers once it has seen the corpus, and a
  * duplicated (at-least-once redelivered) batch must not move a single
  * register — idempotence is the property that replaces the dedup
  * ledger every exact-distinct formulation would need. */
class DistinctGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-distinctgate-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("stream estimates equal the batch estimator; duplicate batch moves nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()

    // latest estimate per source, plus a snapshot taken after the full
    // corpus (batches 1+2) to compare with the post-duplicate state
    val latest = new scala.collection.mutable.HashMap[String, (Long, Long)]()
    val input = MemoryStream[(String, String)]
    val q = DistinctGate.distinctShingles(input.toDS().toDF("source", "text"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cp-hll").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long, Long)], _: Long) =>
        batch.collect().foreach { case (src, est, zeros) =>
          latest.synchronized { latest(src) = (est, zeros) }
        }
        ()
      }
      .start()

    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    val afterAllData = latest.synchronized(latest.toMap)
    // at-least-once: re-feed batch 1 verbatim — idempotent max-merge
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val afterDup = latest.synchronized(latest.toMap)
    assert(afterDup == afterAllData,
      "a duplicated batch changed a register — the sketch lost idempotence")

    // integer equality with the batch estimator (same Sketches exprs)
    val batchEst = graft.operators.TextQueries.q18HllAudit
      .build(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_est"), r.getAs[Long]("n_zero_reg"))).toMap
    assert(afterAllData.keySet == batchEst.keySet)
    batchEst.foreach { case (src, (est, zeros)) =>
      assert(afterAllData(src) == ((est, zeros)), s"$src stream/batch estimate drift")
    }
  }
}
