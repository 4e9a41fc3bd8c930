package graft

import graft.streaming.CheckpointStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operations CLI — the engine's `propulsion`-tool surface
  * (SURVEY §2.11; reference tools/Propulsion.Tool/Program.fs):
  *
  *   checkpoint-show <cpDir>
  *   checkpoint-override <cpDir> <source> <tranche> <group> <pos>
  *   stats <storeDir>          # per-stream store summary (q06 shape)
  *   quarantine-stats <modality>=<quarantineDir>:<keptDir> ...
  *                             # measured over-drop rate of the lossy
  *                             # modality gates (image|audio|video) —
  *                             # one labeled row per supplied gate
  *                             # (NearDupStream.overDropReport)
  *   corpus-report <sfDir>     # curation report card (q18_corpus_report)
  *   sync <sfDir> <workDir>    # delegates to graft.Pipeline
  *   import-export <exportDir> <outDir> [eventsPerBatch]
  *                             # DynamoDB S3-export → index spans
  *                             # (reference DynamoDbExport importer)
  */
object Tool {

  def main(args: Array[String]): Unit = args.toList match {
    case "sync" :: rest => Pipeline.main(rest.toArray)
    case cmd :: rest => withSpark { spark => run(spark, cmd, rest) }
    case Nil =>
      System.err.println("usage: checkpoint-show|checkpoint-override|stats|sync ...")
      sys.exit(2)
  }

  private def run(spark: SparkSession, cmd: String, rest: List[String]): Unit =
    (cmd, rest) match {
      case ("checkpoint-show", dir :: Nil) =>
        val rows = CheckpointStore.read(spark, dir)
        if (rows.isEmpty) println("(no checkpoints)")
        else rows.sortBy(r => (r._1, r._2, r._3)).foreach { case (s, t, g, p) =>
          println(f"$s%-16s tranche=$t%-6s group=$g%-12s pos=$p")
        }
      case ("checkpoint-override", dir :: source :: tranche :: group :: pos :: Nil) =>
        CheckpointStore.commit(spark, dir, source, tranche, group, pos.toLong)
        println(s"checkpoint set: $source/$tranche/$group -> $pos")
      case ("stats", store :: Nil) =>
        spark.read.parquet(store)
          .groupBy(col("stream_name"))
          .agg((max(col("idx")) + 1).as("write_pos"), count(lit(1)).as("n_events"))
          .orderBy(col("stream_name"))
          .show(100, truncate = false)
      case ("quarantine-stats", specs) if specs.nonEmpty =>
        // one row per supplied gate: the basis-point over-drop stat an
        // operator sizes the batch re-adjudication pass with
        import graft.streaming.{AudioDupStream, ImageDupStream, VideoDupStream}
        specs.map { s =>
          (s.split("=", 2), s) match {
            case (Array(modality, dirs), _) if dirs.contains(":") =>
              val Array(q, k) = dirs.split(":", 2)
              val r = modality match {
                case "image" => ImageDupStream.quarantineReport(spark, q, k)
                case "audio" => AudioDupStream.quarantineReport(spark, q, k)
                case "video" => VideoDupStream.quarantineReport(spark, q, k)
                case other =>
                  System.err.println(s"unknown modality '$other' (image|audio|video)")
                  sys.exit(2)
              }
              r.select(lit(modality).as("modality"), col("*"))
            case _ =>
              System.err.println(s"bad gate spec '$s' (want modality=quarantineDir:keptDir)")
              sys.exit(2)
          }
        }.reduce(_ unionByName _).show(10, truncate = false)
      case ("corpus-report", sfDir :: Nil) =>
        operators.CurationQueries.q18CorpusReport.build(spark, sfDir)
          .show(200, truncate = false)
      case ("import-export", exportDir :: outDir :: rest1) if rest1.size <= 1 =>
        val perBatch = rest1.headOption.map(_.toInt).getOrElse(1000)
        val (ready, pending) =
          sources.DynamoExport.importSpans(
            sources.DynamoExport.readSpans(spark, exportDir), perBatch)
        ready.write.mode("overwrite").parquet(s"$outDir/ready")
        pending.write.mode("overwrite").parquet(s"$outDir/pending")
        val nReady = spark.read.parquet(s"$outDir/ready").count()
        val nPending = spark.read.parquet(s"$outDir/pending").count()
        println(s"imported: $nReady ready span batches, $nPending pending islands -> $outDir")
      case _ =>
        System.err.println(s"bad arguments for $cmd")
        sys.exit(2)
    }

  private def withSpark[A](f: SparkSession => A): A = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tool")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try f(spark) finally spark.stop()
  }
}
