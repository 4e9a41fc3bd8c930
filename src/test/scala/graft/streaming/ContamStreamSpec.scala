package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ContamStream: the stateless stream-side decontamination gate must
  * classify exactly like the batch q18_contamination hit set, across
  * micro-batch boundaries and under redelivery. */
class ContamStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-contamstream-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streaming gate classifies identically to the batch contamination check") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // static holdout artifact, exactly as a production gate would load it
    val evalGrams = ContamStream.gramDigests(docs.where(col("doc_id") % 10 === 3)).cache()
    val train = docs.where(col("doc_id") % 10 =!= 3)
      .as[(Long, String)].collect()
    assert(train.nonEmpty)

    val results = new scala.collection.mutable.HashMap[Long, Boolean]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", tmp("cp-contam"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ContamStream.classify(batch, evalGrams)
          .collect()
          .foreach(r => results.synchronized {
            results(r.getAs[Long]("doc_id")) = r.getAs[Boolean]("contaminated")
          })
        ()
      }
      .start()
    val (b1, b2) = train.splitAt(train.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    // redelivery: re-sending batch 1 must re-classify identically
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    q.stop()

    // batch oracle: a train doc is contaminated iff it shares any 8-gram
    // with the holdout (the q18_contamination hit rule)
    val hits = ContamStream.gramDigests(docs.where(col("doc_id") % 10 =!= 3))
      .join(evalGrams.select("g"), Seq("g"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().toSet
    val expected = train.map { case (id, _) => id -> hits.contains(id) }.toMap
    assert(results.toMap == expected)
    assert(hits.nonEmpty, "fixture should contain at least one contaminated doc")
  }
}
