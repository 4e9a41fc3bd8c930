package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ANN serve gate must answer exactly like the batch
  * IVF query: same routing, same integer dots, same tie-breaks —
  * across micro-batch boundaries and under redelivery (stateless). */
class AnnServeGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-annserve-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("stream serve equals batch gate and the oracle-audited q18_ann_ivf") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (qn, cent) = graft.operators.SimilarityQueries.ivfIndex(spark, dir)
    val qnC = qn.localCheckpoint()
    val centC = cent.localCheckpoint()

    // probes = corpus vectors (id < 5), self-excluded — the exact
    // q18_ann_ivf convention, so the oracle-audited rows are the truth
    val probeRows = Envelope.readTable(spark, dir, "embeddings")
      .where(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    assert(probeRows.length == 5)

    val results = new scala.collection.mutable.HashMap[(Long, Long), (Long, Long, Long)]()
    var redeliveryMismatch = false
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDS().toDF("qid", "vec")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cp-annserve").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnServeGate.serve(batch, qnC, centC, k = 3, excludeSelf = true)
          .collect().foreach { r =>
            val key = (r.getAs[Long]("qid"), r.getAs[Int]("rnk").toLong)
            val v = (r.getAs[Long]("cand_id"), r.getAs[Long]("dot_s"),
              r.getAs[Int]("probe_label").toLong)
            results.synchronized {
              if (results.contains(key) && results(key) != v) redeliveryMismatch = true
              results(key) = v
            }
          }
        ()
      }
      .start()
    val (b1, b2) = probeRows.splitAt(2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    input.addData(b1.toIndexedSeq); q.processAllAvailable() // redelivery
    q.stop()
    assert(!redeliveryMismatch, "redelivered probe answered differently")

    // truth: the oracle-audited batch query's rows
    val expected = graft.operators.SimilarityQueries.q18AnnIvf
      .build(spark, dir).collect()
      .map { r =>
        (r.getAs[Long]("probe_id"), r.getAs[Int]("rnk").toLong) ->
          ((r.getAs[Long]("cand_id"), r.getAs[Long]("dot_s"),
            r.getAs[Int]("probe_label").toLong))
      }.toMap
    assert(expected.nonEmpty)
    assert(results.toMap == expected,
      "stream serve diverged from the batch IVF query")
  }
}
