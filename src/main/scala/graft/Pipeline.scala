package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{AppendSink, CheckpointStore, InputEvent, StreamProcessor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** End-to-end pipeline CLI — the engine's `sync` tool
  * (SURVEY §2.11; reference tools/Propulsion.Tool/Sync.fs):
  *
  *   events parquet → ndjson feed → JsonLinesSource (DSv2 tranches,
  *   Trigger.AvailableNow) → from_json parse → per-stream
  *   StreamProcessor fold → idempotent AppendSink + checkpoint table.
  *
  * Usage: runMain graft.Pipeline <sfDir> <workDir>
  */
object Pipeline {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = args.lift(1).getOrElse(Files.createTempDirectory("graft-pipeline").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // §2.8 observability: roll up StreamingQueryProgress per query
    val stats = new graft.streaming.Observability.StatsListener
    spark.streams.addListener(stats)

    // 1. stage the events table as an ndjson feed file
    Files.createDirectories(Paths.get(work))
    val feedFile = s"$work/feed.ndjson"
    val env = graft.model.Envelope.fromEvents(
      graft.model.Envelope.readTable(spark, sfDir, "events"))
      .select(col("stream_name"), col("idx"), col("event_type"),
        col("props").as("data"), col("size").cast("long").as("size"))
    // driver-side staging is demo-CLI-only: gate it so a big SF can't
    // silently OOM the driver — past the cap, stage with a distributed
    // writer (df.write.json) and a file feed per tranche instead
    // resume semantics: a restarted run (same workDir, feed already
    // staged) must NOT rewrite the feed — the source's committed
    // tranche offsets are line positions into THIS file, and a resume
    // continues from them (the crash-resume drive in SCALING.md kills
    // the JVM mid-batch and restarts against the same workDir)
    if (Files.exists(Paths.get(feedFile))) {
      println(s"[pipeline] feed already staged, resuming: $feedFile")
    } else {
      val stageCap = sys.env.getOrElse("SPARK_GRAFT_STAGE_CAP", "2000000").toLong
      val nEvents = env.count()
      require(nEvents <= stageCap,
        s"refusing to stage $nEvents rows through the driver (cap $stageCap); " +
          "use a distributed writer for this scale")
      val lines = env.orderBy(col("idx"), col("stream_name")) // interleave streams
        .select(to_json(struct(col("*"))).as("j")).as[String].collect()
      Files.writeString(Paths.get(feedFile), lines.mkString("\n") + "\n")
      println(s"[pipeline] staged ${lines.length} events -> $feedFile")
    }

    // 2. stream it back through the DSv2 tranche source and the
    //    per-stream processor, sinking idempotently per micro-batch
    val feedSchema = StructType(Seq(
      StructField("stream_name", StringType), StructField("idx", LongType),
      StructField("event_type", StringType), StructField("data", StringType),
      StructField("size", LongType)))
    val parsed = spark.readStream.format("graft.sources.JsonLinesSource")
      .option("path", feedFile).option("numTranches", "4")
      // admitted-batch knob (the reference's read-ahead × batch-size
      // admission): 400 suits the sf0.001 demo; the 10× crash-resume
      // drive admits 25k-line pages so the run is batches, not hours
      .option("maxLinesPerTrigger",
        sys.env.getOrElse("SPARK_GRAFT_FEED_LINES_PER_TRIGGER", "400"))
      .load()
      .select(from_json(col("value"), feedSchema).as("e"))
      .select(col("e.stream_name").as("streamName"), col("e.idx").as("index"),
        col("e.event_type").as("eventType"), col("e.data").as("data"),
        col("e.size").as("size"), lit(false).as("isUnfold"))
      .as[InputEvent]

    // requireAll: a stream dispatches only contiguously from its write
    // position, so the sink can never see a gapped island — paired with
    // the per-island PrefixMissing classification this makes the
    // pipeline loss-free by construction (held spans persist in the
    // state store and resume on the next run).
    val processed = StreamProcessor.process[String](
      parsed, (_, evs) => s"n=${evs.size}", requireAll = true)

    val target = s"$work/store"
    val cpTable = s"$work/checkpoints"
    val q = processed.writeStream
      .option("checkpointLocation", s"$work/cp")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[_], batchId: Long) =>
        // quarantined (failed) spans are dead-lettered, never appended to
        // the store as if processed — only healthy spans explode to rows
        val df = batch.toDF()
        val dead = df.where(col("failed"))
        if (!dead.isEmpty)
          dead.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(s"$work/deadletter")
        // one store row per event index — the sink's contiguity lattice
        // operates on event positions, not span summaries
        val events = df.where(!col("failed"))
          .select(col("streamName").as("stream_name"),
            explode(expr("sequence(fromIndex, toIndex)")).as("idx"), col("result"))
        val outcomes = AppendSink.appendIdempotent(spark, target, events)
        // bounded collect: one row per outcome kind (4-element lattice)
        val counts = outcomes.groupBy(col("outcome")).count()
          .as[(String, Long)].collect().toMap
        CheckpointStore.commit(spark, cpTable, "jsonlines", "all", "pipeline", batchId)
        println(s"[pipeline] batch=$batchId outcomes=$counts")
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val stored = spark.read.parquet(target)
    println(s"[pipeline] store rows=${stored.count()} " +
      s"streams=${stored.select("stream_name").distinct().count()}")
    stats.snapshot.values.foreach(s => println(
      s"[pipeline] stats batches=${s.batches} inputRows=${s.inputRows} " +
        s"stateRows=${s.stateRows} lastBatchMs=${s.lastBatchDurationMs}"))
    println(s"[pipeline] committed checkpoint=" +
      CheckpointStore.position(spark, cpTable, "jsonlines", "all", "pipeline"))
    spark.stop()
  }
}
