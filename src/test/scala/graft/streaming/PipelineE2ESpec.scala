package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end ingest pipeline: quality gate → exact-dedup gate →
  * streaming pack, chained over ordered micro-batches — the composed
  * production shape, not three isolated unit tests. The streamed
  * result must equal the batch composition (Gopher keep → min-doc_id
  * per content hash → per-source prefix-sum packing), a redelivered
  * batch must be a no-op end to end, and a crash between the dedup
  * index write and its marker must redo the batch identically with
  * the pack stage dropping the resent docs at its cursor. */
class PipelineE2ESpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-e2e-test")
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

  test("quality → exact-dedup → pack matches the batch composition; redelivery and crash-redo are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // corpus: sf0.001 docs + injected exact copies (higher doc_ids, so
    // ordered ingest always delivers the original first)
    val base = Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val copies = base.take(40).map { case (id, t, s) => (id + 100000L, t, s) }
    val all = (base ++ copies).sortBy(_._1)
    val bySrc = all.map { case (id, t, s) => id -> s }.toMap
    val nWords = all.map { case (id, t, _) => id -> t.split(" ", -1).length.toLong }.toMap

    // quality keep set via the REGISTERED gate over the full corpus
    val keepIds = CurationGates.gopherClassify(
      all.toSeq.toDF("doc_id", "text", "source"))
      .where(col("keep")).select(col("doc_id")).as[Long].collect().toSet
    assert(keepIds.nonEmpty && keepIds.size < all.length,
      "fixture must exercise both quality outcomes")

    val indexDir = tmp("e2e-idx"); val keptDir = tmp("e2e-kept")
    val packed = scala.collection.mutable.Map.empty[Long, (String, Long)]
    var reassigned = false
    val input = MemoryStream[PackInput]
    val drops = PackStream.dropCounter(spark)
    val packQ = PackStream.process(input.toDS(), budget = 512L, dropped = Some(drops))
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("cp-e2e-pack"))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[PackedDoc], _: Long) =>
        b.collect().foreach { p =>
          packed.synchronized {
            if (packed.contains(p.doc_id) && packed(p.doc_id) != ((p.source, p.chunk_id)))
              reassigned = true
            packed(p.doc_id) = (p.source, p.chunk_id)
          }
        }
        ()
      }.start()

    def runBatch(batch: Seq[(Long, String, String)], id: Long): Seq[Long] = {
      val bdf = batch.toDF("doc_id", "text", "source")
      val quality = bdf.where(col("doc_id").isin(keepIds.toSeq: _*))
      ExactDupStream.processBatch(
        quality.select(col("doc_id"), col("text")), id, indexDir, keptDir)
      val kept = spark.read.parquet(s"$keptDir/batch=$id")
        .select(col("doc_id")).as[Long].collect().sorted.toSeq
      input.addData(kept.map(id => PackInput(bySrc(id), id, nWords(id))))
      packQ.processAllAvailable()
      kept
    }

    val batchSize = (all.length + 2) / 3
    val batches = all.grouped(batchSize).toSeq
    val keptPerBatch = batches.zipWithIndex.map { case (b, i) => runBatch(b.toSeq, i.toLong) }

    // ---- batch oracle: Gopher keep → min doc_id per text → pack ----
    val survivors = all.filter { case (id, _, _) => keepIds.contains(id) }
      .groupBy(_._2).map { case (_, xs) => xs.minBy(_._1) }.toSeq.sortBy(_._1)
    assert(survivors.size < keepIds.size, "fixture must exercise dedup drops")
    val expected = survivors.groupBy(_._3).iterator.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).iterator.map { case (id, t, _) =>
        val c = cum / 512L; cum += nWords(id); id -> ((src, c))
      }
    }.toMap
    packQ.processAllAvailable()
    assert(packed.toMap == expected)
    assert(!reassigned, "an admitted pack assignment changed")

    // ---- redelivered batch: marker short-circuits, nothing re-emitted
    val packedBefore = packed.synchronized(packed.toMap)
    runBatch(batches(0).toSeq, 0L)
    assert(packed.synchronized(packed.toMap) == packedBefore)

    // ---- crash between index write and marker: batch 2 redone
    // identically; pack cursor absorbs the resend as counted drops
    val marker = java.nio.file.Paths.get(s"$indexDir/_batches/batch-2")
    java.nio.file.Files.delete(marker)
    val dropsBefore = drops.value
    val keptRedo = runBatch(batches(2).toSeq, 2L)
    assert(keptRedo == keptPerBatch(2), "crash-redo changed the kept set")
    assert(packed.synchronized(packed.toMap) == packedBefore)
    assert(drops.value - dropsBefore == keptRedo.size.toLong,
      "every resent doc must be a counted cursor drop")
    packQ.stop()
  }
}
