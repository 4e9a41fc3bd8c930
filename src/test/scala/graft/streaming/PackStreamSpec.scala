package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming packing gate must assign the exact chunk ids the
  * batch q18_pack prefix sum computes, across micro-batch splits and
  * under redelivery (redelivered docs drop; admitted assignments never
  * change). */
class PackStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-packstream-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("chunk assignments match the batch prefix sum; redelivery drops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .as[(String, Long, Long)].collect()
      .sortBy(_._2) // global doc_id order implies per-source order
      .map { case (s, id, n) => PackInput(s, id, n) }

    val got = scala.collection.mutable.Map.empty[Long, (String, Long)]
    var changed = false
    val input = MemoryStream[PackInput]
    val drops = PackStream.dropCounter(spark)
    val q = PackStream.process(input.toDS(), budget = 512L, dropped = Some(drops))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cp-pack").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[PackedDoc], _: Long) =>
        b.collect().foreach { p =>
          got.synchronized {
            if (got.contains(p.doc_id) && got(p.doc_id) != ((p.source, p.chunk_id)))
              changed = true
            got(p.doc_id) = (p.source, p.chunk_id)
          }
        }
        ()
      }.start()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    val dropsBeforeRedelivery = drops.value
    // redelivery of already-admitted docs: no output, no reassignment —
    // but OBSERVABLE: every cursor-drop increments the accumulator, so
    // an ordering-contract violation can never be silent data loss
    val before = got.synchronized(got.size)
    input.addData(b1.take(50).toIndexedSeq); q.processAllAvailable()
    q.stop()
    assert(got.size == before, "redelivered docs produced output")
    assert(!changed, "an admitted assignment changed")
    assert(drops.value - dropsBeforeRedelivery == 50L,
      s"expected 50 counted drops, got ${drops.value - dropsBeforeRedelivery}")

    // batch oracle: per-source running sum in doc_id order
    val expected = docs.groupBy(_.source).iterator.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_.docId).iterator.map { d =>
        val c = cum / 512L; cum += d.nWords; d.docId -> ((src, c))
      }
    }.toMap
    assert(got.toMap == expected)
    // and identical per-chunk rollup to the q18_pack oracle shape
    val gotChunks = got.toMap.groupBy(_._2).view.mapValues(_.size).toMap
    assert(gotChunks.values.sum == docs.length && gotChunks.nonEmpty)
  }

  test("dropCounter is memoized per session: monitor and wiring share one counter") {
    val a = PackStream.dropCounter(spark)
    val b = PackStream.dropCounter(spark)
    assert(a eq b, "two dropCounter calls must resolve to the same accumulator")
  }
}
