package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental chunk-level line dedup: the streamed admitted set must
  * equal the batch q18_line_dedup first-occurrence rule when batches
  * arrive in document order, and redelivered chunks must admit
  * nothing. */
class ChunkStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-chunkstream-test")
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

  test("streamed chunk dedup equals the batch first-occurrence rule; redelivery is a no-op") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"a$i").mkString(" ") // chunk A
    val b = (1 to 10).map(i => s"b$i").mkString(" ") // chunk B
    val docsB1 = Seq(DocIn(1L, s"$a $b"), DocIn(2L, s"$b tail words"))
    val docsB2 = Seq(DocIn(3L, s"$a fresh new chunk"), DocIn(4L, s"$a $b"))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ChunkIn]
    val out = LineDedupStream.firstSeen(input.toDS())
    val q = out.writeStream.format("memory").queryName("chunk_out")
      .outputMode("append").option("checkpointLocation", tmp("cp-chunk")).start()

    def kept(): Set[(Long, Int)] =
      spark.table("chunk_out").as[KeptChunk]
        .collect().map(k => (k.docId, k.ci)).toSet

    val chunksB1 = LineDedupStream.chunksOf(docsB1.toDS()).collect()
    input.addData(chunksB1.toIndexedSeq)
    q.processAllAvailable()
    // doc 1 owns A and B; doc 2's B drops, its tail chunk survives
    assert(kept() == Set((1L, 0), (1L, 1), (2L, 1)))

    val chunksB2 = LineDedupStream.chunksOf(docsB2.toDS()).collect()
    input.addData(chunksB2.toIndexedSeq)
    input.addData(chunksB1.toIndexedSeq) // redelivery of batch 1
    q.processAllAvailable()
    val streamed = kept()
    // doc 3's A drops against history, its fresh tail survives; doc 4
    // (a full copy of doc 1) admits nothing; redelivery admits nothing
    assert(streamed == Set((1L, 0), (1L, 1), (2L, 1), (3L, 1)))
    q.stop()

    // parity: batch first-occurrence over the full corpus (doc order)
    val all = (docsB1 ++ docsB2).flatMap { d =>
      d.text.split(" ").grouped(10).zipWithIndex.map { case (ws, i) =>
        (d.docId, i, ws.mkString(" "))
      }
    }
    val batchKeep = all.groupBy(_._3).values.map(_.minBy(c => (c._1, c._2)))
      .map(c => (c._1, c._2)).toSet
    assert(streamed == batchKeep)
  }
}
