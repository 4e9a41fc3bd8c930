package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Index refresh against a live serving gate ([[AnnIndexStore]]):
  * production ANN serving re-centroids/re-assigns as the corpus grows,
  * and the refresh must be (a) invisible mid-batch (atomic `_current`
  * swap), (b) equal to a cold rebuild on base+delta (same ivfIndexOf
  * expressions), and (c) mutually exclusive (the `_refreshing` lease).
  * The spec drives one gate across a refresh boundary and pins every
  * answer against the corresponding cold index. */
class AnnIndexRefreshSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ann-refresh-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def embsAll: DataFrame =
    Envelope.readTable(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))

  /** base = even labels' vectors; delta = the rest (a corpus growth
    * step that ADDS clusters, so the refresh genuinely re-centroids:
    * routing for some probes must change across the boundary). */
  private def base: DataFrame = embsAll.where(col("label") % 2 === 0)
  private def grown: DataFrame = embsAll

  private def answers(r: DataFrame): Map[(Long, Long), (Long, Long)] =
    r.collect().map { row =>
      (row.getAs[Long]("qid"), row.getAs[Int]("rnk").toLong) ->
        ((row.getAs[Long]("cand_id"), row.getAs[Long]("dot_s")))
    }.toMap

  test("serve across a refresh boundary == cold rebuild on each side") {
    val indexDir = java.nio.file.Files.createTempDirectory("ann-index").toString
    val v1 = AnnIndexStore.refresh(spark, base, indexDir)
    assert(v1 == 1L && AnnIndexStore.currentVersion(spark, indexDir).contains(1L))

    val probes = embsAll.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
      .localCheckpoint()

    // batch 1 against v1, then refresh on base+delta, then batch 2
    val got1 = answers(AnnIndexStore.serveCurrent(spark, probes, indexDir, k = 3))
    val v2 = AnnIndexStore.refresh(spark, grown, indexDir)
    assert(v2 == 2L && AnnIndexStore.currentVersion(spark, indexDir).contains(2L))
    val got2 = answers(AnnIndexStore.serveCurrent(spark, probes, indexDir, k = 3))

    // each side equals a COLD index built directly from the same rows
    val (qb, cb) = graft.operators.SimilarityQueries.ivfIndexOf(base)
    val (qg, cg) = graft.operators.SimilarityQueries.ivfIndexOf(grown)
    val cold1 = answers(AnnServeGate.serve(probes, qb, cb, k = 3))
    val cold2 = answers(AnnServeGate.serve(probes, qg, cg, k = 3))
    assert(got1 == cold1, "pre-refresh serve diverged from cold rebuild on base")
    assert(got2 == cold2, "post-refresh serve diverged from cold rebuild on base+delta")
    // the refresh is REAL on this fixture: new clusters change answers
    assert(got1 != got2, "refresh was a no-op — fixture exercises nothing")
  }

  test("streaming gate flips index version between micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = java.nio.file.Files.createTempDirectory("ann-index-stream").toString
    AnnIndexStore.refresh(spark, base, indexDir)

    val probeRows = embsAll.where(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val results = scala.collection.mutable.ArrayBuffer.empty[Map[(Long, Long), (Long, Long)]]
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDS().toDF("qid", "vec")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cp-ann-refresh").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val snap = answers(AnnIndexStore.serveCurrent(spark, batch, indexDir, k = 3))
        results.synchronized { results += snap }
        ()
      }
      .start()
    input.addData(probeRows.toIndexedSeq); q.processAllAvailable()
    AnnIndexStore.refresh(spark, grown, indexDir) // refresh BETWEEN batches
    input.addData(probeRows.toIndexedSeq); q.processAllAvailable()
    q.stop()

    val probes = embsAll.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val (qb, cb) = graft.operators.SimilarityQueries.ivfIndexOf(base)
    val (qg, cg) = graft.operators.SimilarityQueries.ivfIndexOf(grown)
    assert(results.length == 2)
    assert(results(0) == answers(AnnServeGate.serve(probes, qb, cb, k = 3)))
    assert(results(1) == answers(AnnServeGate.serve(probes, qg, cg, k = 3)))
  }

  test("a batch in flight ACROSS the swap completes on its resolved version; the next batch reads the new one") {
    val indexDir = java.nio.file.Files.createTempDirectory("ann-index-interleave").toString
    AnnIndexStore.refresh(spark, base, indexDir)

    val probes = embsAll.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
      .localCheckpoint()

    // the serving batch resolves _current = 1, and THEN — inside the
    // resolve→read window, via the onResolve seam — a full refresh to
    // v=2 completes, swapping the pointer and running GC. The in-
    // flight batch must still complete on v=1 (GC retains current-1
    // exactly for this reader) and answer as the v=1 index.
    var resolvedAt = -1L
    val inflight = AnnIndexStore.serveCurrent(spark, probes, indexDir, k = 3,
      onResolve = { v =>
        resolvedAt = v
        val v2 = AnnIndexStore.refresh(spark, grown, indexDir)
        assert(v2 == 2L)
        assert(AnnIndexStore.currentVersion(spark, indexDir).contains(2L))
      })
    val gotInflight = answers(inflight) // action AFTER the swap
    assert(resolvedAt == 1L)
    val (qb, cb) = graft.operators.SimilarityQueries.ivfIndexOf(base)
    val (qg, cg) = graft.operators.SimilarityQueries.ivfIndexOf(grown)
    assert(gotInflight == answers(AnnServeGate.serve(probes, qb, cb, k = 3)),
      "in-flight batch did not complete on the version it resolved")
    // v=1 is still on disk (retained as current-1), v=2 is current
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(indexDir, "v=1", "_complete")))
    // the NEXT batch re-resolves and reads the refreshed index
    val gotNext = answers(AnnIndexStore.serveCurrent(spark, probes, indexDir, k = 3))
    assert(gotNext == answers(AnnServeGate.serve(probes, qg, cg, k = 3)))
    assert(gotInflight != gotNext, "refresh was a no-op — fixture exercises nothing")
    // ...and one more refresh collects v=1 (now current-2)
    AnnIndexStore.refresh(spark, grown, indexDir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(indexDir, "v=1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(indexDir, "v=2", "_complete")))
  }

  test("refresh lease excludes concurrent refreshers; stale lease is explicit") {
    val indexDir = java.nio.file.Files.createTempDirectory("ann-index-lease").toString
    AnnIndexStore.refresh(spark, base, indexDir)
    val leasePath = java.nio.file.Paths.get(indexDir, "_refreshing")
    java.nio.file.Files.createFile(leasePath)
    val ex = intercept[IllegalStateException] {
      AnnIndexStore.refresh(spark, grown, indexDir)
    }
    assert(ex.getMessage.contains("_refreshing"))
    // the failed attempt must not have eaten the foreign lease
    assert(java.nio.file.Files.exists(leasePath))
    java.nio.file.Files.delete(leasePath)
    assert(AnnIndexStore.refresh(spark, grown, indexDir) == 2L)
  }

  test("an unsealed crash-leftover version is unreachable") {
    val indexDir = java.nio.file.Files.createTempDirectory("ann-index-crash").toString
    AnnIndexStore.refresh(spark, base, indexDir)
    // simulate a refresher that died after the parquet writes but
    // before sealing: v=2 exists, no _complete, _current still = 1
    val vdir = java.nio.file.Paths.get(indexDir, "v=2")
    java.nio.file.Files.createDirectories(vdir)
    assert(AnnIndexStore.currentVersion(spark, indexDir).contains(1L))
    val (qn, _) = AnnIndexStore.load(spark, indexDir)
    assert(qn.count() > 0) // still serving v1
    // the NEXT refresh claims version 2? No: versions only move forward
    // off _current, so the leftover dir is overwritten by the retry —
    // which is exactly the redo-overwrites idempotency of the batch
    // marker protocol
    val v = AnnIndexStore.refresh(spark, grown, indexDir)
    assert(v == 2L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(indexDir, "v=2", "_complete")))
  }
}
