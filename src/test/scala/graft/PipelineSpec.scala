package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end drive of the `sync` pipeline CLI (SURVEY §2.11): events
  * parquet → ndjson feed → JsonLinesSource tranches → per-stream
  * processor (requireAll) → idempotent AppendSink + checkpoint table.
  * Loss-free by construction, so the store must hold exactly one row
  * per source event and a second run must append nothing. */
class PipelineSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("sync is loss-free, idempotent on re-run, and commits checkpoints") {
    val work = Files.createTempDirectory("graft-pipeline-spec").toString
    val out1 = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        Tool.main(Array("sync", sfDir, work))
      }
      bos.toString("UTF-8")
    }
    assert(out1.contains("[pipeline] staged"), out1.take(400))

    // fresh session for the assertions (Pipeline stopped its own)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val nEvents = graft.model.Envelope.fromEvents(
        graft.model.Envelope.readTable(spark, sfDir, "events")).count()
      val store = spark.read.parquet(s"$work/store")
      assert(store.count() == nEvents,
        s"store holds ${store.count()} rows for $nEvents source events")
      // exactly one row per (stream, idx): no duplicates slipped the sink
      assert(store.select("stream_name", "idx").distinct().count() == nEvents)
      // nothing was quarantined
      assert(!new java.io.File(s"$work/deadletter").exists())
      // the external checkpoint table committed a position
      assert(graft.streaming.CheckpointStore
        .position(spark, s"$work/checkpoints", "jsonlines", "all", "pipeline").nonEmpty)
    } finally spark.stop()

    // re-run over the same work dir: the streaming checkpoint resumes
    // at the tail and the sink appends nothing (idempotence)
    Console.withOut(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream(), true, "UTF-8")) {
      Tool.main(Array("sync", sfDir, work))
    }
    val spark2 = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val nEvents = graft.model.Envelope.fromEvents(
        graft.model.Envelope.readTable(spark2, sfDir, "events")).count()
      assert(spark2.read.parquet(s"$work/store").count() == nEvents,
        "re-run appended rows — sink is not idempotent")
    } finally spark2.stop()
  }
}
