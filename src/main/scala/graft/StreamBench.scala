package graft

import graft.model.Envelope
import graft.streaming.{InputEvent, StreamProcessor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-engine throughput bench (not driver-run; numbers recorded
  * in BASELINE.md): pushes the events table through the span engine —
  * the reference's MemoryStoreSource → Scheduler/Dispatcher path — in
  * fixed-size micro-batches and reports end-to-end events/sec,
  * including per-stream span coalescing, write-pos dedupe, and handler
  * dispatch. Throughput scales with stream cardinality (per-stream
  * serialization is the ordering contract), so the events table's
  * ~10k users at sf0.1 is the interesting regime.
  *
  * args: [batches] [statePartitions] [engine]. engine = `fmgws`
  * (default: flatMapGroupsWithState on the HDFS-backed store) or `tws`
  * (transformWithState on RocksDB with changelog checkpointing — the
  * claimed 100 TB state path; same pure `step`, so the comparison
  * isolates the state-backend cost).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    // state-store partition count: fixed at first checkpoint, sized so
    // per-micro-batch task+commit overhead doesn't swamp small batches
    val statePartitions = args.lift(1).map(_.toInt).getOrElse(32)
    val engine = args.lift(2).getOrElse("fmgws")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", statePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (engine == "tws") {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // events → InputEvent in stream order (the envelope's per-stream
    // contiguous index), collected locally: MemoryStream is fed from
    // the driver by design, like the reference's MemoryStoreSource
    val evs = Envelope.fromEvents(Envelope.readTable(spark, sfDir, "events"))
      .select(col("stream_name"), col("idx"), col("event_type"),
        col("props").as("data"))
      .as[(String, Long, String, String)]
      .collect()
      .map { case (s, i, t, d) => InputEvent(s, i, t, d, d.length.toLong, isUnfold = false) }
    val n = evs.length
    val per = math.max(1, n / batches)

    val cp = java.nio.file.Files.createTempDirectory("streambench").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[InputEvent]
    val handle: (String, Seq[InputEvent]) => Long = (_, events) => events.map(_.size).sum
    val out =
      if (engine == "tws") graft.streaming.StreamProcessorTws.process[Long](input.toDS(), handle)
      else StreamProcessor.process[Long](input.toDS(), handle)
    val q = out.writeStream.format("noop")
      .outputMode("append").option("checkpointLocation", cp).start()

    val t0 = System.nanoTime()
    var fed = 0
    evs.grouped(per).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable() // one micro-batch per feed, like a tranche page
      fed += 1
    }
    val wallS = (System.nanoTime() - t0) / 1e9
    q.stop()

    val eps = n / wallS
    // report the batches actually fed (grouped() yields ceil(n/per))
    println(
      s"""{"metric":"stream_events_per_sec","value":${eps.round},"unit":"events/sec",""" +
        s""""engine":"$engine","n_events":$n,"batches":$fed,""" +
        s""""state_partitions":$statePartitions,""" +
        s""""wall_s":${math.round(wallS * 1000) / 1000.0},""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
