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
  *   sync-feed <sfDir> <workDir> [--gate neardup|exact|simhash|winnow]
  *             [--ranges N] [--max-items N]
  *                             # the reference tool's flagship
  *                             # (`sync kafka from cosmos`) composed
  *                             # one-command: change-feed source
  *                             # (fenced leases, manual checkpoints) →
  *                             # per-page span fold / near-dup gate →
  *                             # Kafka wire frame into a topic dir —
  *                             # see [[syncFeed]]
  *   import-export <exportDir> <outDir> [eventsPerBatch]
  *                             # DynamoDB S3-export → index spans
  *                             # (reference DynamoDbExport importer)
  */
object Tool {

  /** The sync-feed usage line, exposed so ToolSpec pins it: every flag
    * the parser accepts (including the r15 `--canonical` post-pass)
    * must be discoverable from the usage error that gates it. */
  private[graft] val syncFeedUsage: String =
    "usage: sync-feed <sfDir> <workDir> [--gate neardup|exact|simhash|winnow] " +
      "[--ranges N] [--max-items N] [--canonical]"

  def main(args: Array[String]): Unit = args.toList match {
    case "sync" :: rest => Pipeline.main(rest.toArray)
    case cmd :: rest => withSpark { spark => run(spark, cmd, rest) }
    case Nil =>
      System.err.println("usage: checkpoint-show|checkpoint-override|stats|sync|sync-feed ...")
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
      case ("sync-feed", rest1) if rest1.size >= 2 =>
        syncFeed(spark, rest1)
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

  /** One-command composed sync — the reference tool's flagship
    * (`propulsion sync kafka from cosmos`,
    * tools/Propulsion.Tool/Sync.fs): change-feed source → processor →
    * producer sink, driven to tail, exactly-once.
    *
    *   - SOURCE: the fixture table staged ONCE as a range-partitioned
    *     change feed (ChangeFeed.withRanges — the Cosmos token-range
    *     analogue; re-runs resume, never restage), consumed by
    *     ChangeFeedProcessor: fenced CAS leases, per-range
    *     continuations, manual checkpoints — the full §2.1 protocol,
    *     not a shortcut scan.
    *   - PROCESSOR: default = the per-page span fold
    *     (SpanCodec.renderSpans — per-stream coalescing, the batch
    *     form of StreamProcessor's group fold; a stream hashes
    *     entirely into one range, so its events arrive in idx order
    *     and spans render contiguously). `--gate <g>` instead routes
    *     DOCUMENT pages through an admission gate on the shared
    *     marker protocol — minhash-LSH near-dup, md5 exact, simhash
    *     pigeonhole, or winnowing passage fingerprints (bucket index
    *     + quarantine where the gate is lossy) — and syncs only the
    *     kept set.
    *   - SINK: SpanCodec.toKafkaFrame rows (key/value/topic — the
    *     exact columns `writeStream.format("kafka")` consumes) landed
    *     in `$workDir/topic/batch=<rangeId:epoch>` — the
    *     partition-faithful parquet topic KafkaTransportSpec pins; on
    *     a clustered deployment the same frame goes to the broker
    *     writer verbatim.
    *
    * Exactly-once: every per-page write (topic; with the gate also
    * kept/quarantine/index) is a batch-scoped overwrite subdir keyed
    * by (rangeId, page epoch), and the lease continuation advances by
    * fenced CAS only AFTER the writes — a crash replays the page into
    * the same subdirs (overwrite, not double), a fenced-off owner
    * loses the CAS and stops. Same marker discipline the crash-resume
    * drive proves for graft.Pipeline. */
  private def syncFeed(spark: SparkSession, args: List[String]): Unit = {
    import graft.sources.{ChangeFeed, ChangeFeedProcessor, LeaseStore}
    // consume each flag WITH its value token, then take what's left as
    // the two positionals — the earlier partition-by-startsWith("--")
    // left flag VALUES ('neardup', '4') in the positional list, so
    // `sync-feed --gate neardup <sf> <work>` silently bound
    // sfDir='neardup' instead of failing with a usage error
    val known = Set("gate", "ranges", "max-items")
    val boolFlags = Set("canonical")
    def usage(msg: String): Nothing = {
      System.err.println(s"sync-feed: $msg\n$syncFeedUsage")
      sys.exit(2)
    }
    @annotation.tailrec
    def parse(rest: List[String], pos: List[String],
        flags: Map[String, String]): (List[String], Map[String, String]) =
      rest match {
        case Nil => (pos.reverse, flags)
        case f :: tail if f.startsWith("--") && boolFlags(f.drop(2)) =>
          parse(tail, pos, flags + (f.drop(2) -> "true"))
        case f :: v :: tail if f.startsWith("--") && known(f.drop(2)) =>
          parse(tail, pos, flags + (f.drop(2) -> v))
        case f :: _ if f.startsWith("--") =>
          usage(s"unknown or value-less flag '$f'")
        case p :: tail => parse(tail, p :: pos, flags)
      }
    val (pos0, flags) = parse(args, Nil, Map.empty)
    if (pos0.size != 2) usage(s"expected 2 positionals, got ${pos0.mkString(", ")}")
    val (sfDir, work) = (pos0.head, pos0(1))
    def flag(name: String): Option[String] = flags.get(name)
    val gate = flag("gate").getOrElse("none")
    val nRanges = flag("ranges").map(_.toInt).getOrElse(4)
    val maxItems = flag("max-items").map(_.toInt).getOrElse(2500)
    val canonical = flag("canonical").contains("true")
    if (canonical && gate == "none")
      usage("--canonical requires a --gate (it re-resolves the gate's dedup clusters)")
    // every admission gate on the shared marker protocol composes here:
    // minhash-LSH near-dup, md5 exact, simhash pigeonhole, winnowing
    // passage fingerprints — same feed, same exactly-once shape, the
    // gate is one batch function
    val gatePayload = Seq("doc_id", "source", "text")
    // each gate returns its KEPT frame (the verdict it just computed),
    // so the topic render below never re-reads kept/batch=N from disk
    val gateBatch: Option[(org.apache.spark.sql.DataFrame, Long, String, String) => org.apache.spark.sql.DataFrame] =
      gate match {
        case "none" => None
        case "neardup" => Some((df, bid, idx, kept) =>
          graft.streaming.NearDupStream.processBatch(df, bid, idx, kept,
            Some(s"$work/quar"), gatePayload))
        case "exact" => Some((df, bid, idx, kept) =>
          graft.streaming.ExactDupStream.processBatch(df, bid, idx, kept, gatePayload))
        case "simhash" => Some((df, bid, idx, kept) =>
          graft.streaming.SimhashDupStream.processBatch(df, bid, idx, kept,
            Some(s"$work/quar"), gatePayload))
        case "winnow" => Some((df, bid, idx, kept) =>
          graft.streaming.WinnowDupStream.processBatch(df, bid, idx, kept,
            Some(s"$work/quar"), gatePayload))
        case other =>
          throw new IllegalArgumentException(
            s"unknown --gate '$other' (neardup|exact|simhash|winnow)")
      }

    val feedDir = s"$work/feed"
    val topicDir = s"$work/topic"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$feedDir/_SUCCESS"))) {
      println(s"[sync-feed] feed already staged, resuming: $feedDir")
    } else {
      val src =
        if (gateBatch.isDefined)
          ChangeFeed.withRanges(
            spark.read.parquet(s"$sfDir/documents.parquet")
              .select(col("doc_id"), col("source"), col("text")),
            "doc_id", nRanges)
            .withColumn("pos", col("doc_id"))
        else {
          import org.apache.spark.sql.expressions.Window
          ChangeFeed.withRanges(
            graft.model.Envelope.fromEvents(
              graft.model.Envelope.readTable(spark, sfDir, "events"))
              .select(col("stream_name"), col("idx"), col("event_type"),
                col("props").as("data")),
            "stream_name", nRanges)
            // per-range position: strictly increasing, stream-ordered —
            // a stream's events page out in idx order (ordering contract)
            .withColumn("pos", row_number().over(
              Window.partitionBy(col("range_id"))
                .orderBy(col("stream_name"), col("idx"))).cast("long"))
        }
      src.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(feedDir)
      println(s"[sync-feed] staged $feedDir (gate=$gate, ranges=$nRanges)")
    }
    // batch keys below pack (rangeId << 40) | epoch; a position at or
    // above 2^40 would alias another range's subdirs — two ranges then
    // overwrite each other's kept/topic/index batches and the gate's
    // shared marker silently short-circuits one range's page. Checked
    // ONCE at staging (epoch = max pos a page can carry), not per page.
    val maxPos = spark.read.parquet(feedDir).agg(max(col("pos"))).first().getLong(0)
    require(maxPos < (1L << 40),
      s"sync-feed: feed position $maxPos exceeds 2^40-1; the packed (range,epoch) " +
        "batch key would collide across ranges — re-key the feed position")

    var pages = 0L
    var rows = 0L
    val handler: (graft.sources.ChangeFeedContext, org.apache.spark.sql.DataFrame, () => Unit) => Unit =
      (ctx, page, checkpoint) => {
        // (rangeId, epoch) is unique per admitted page and stable
        // across a replay of the same continuation — the batch key of
        // every write below
        val batchId = (ctx.rangeId.toLong << 40) | ctx.epoch
        val rendered = gateBatch match {
          case Some(run) =>
            run(page.select(gatePayload.map(col): _*), batchId,
              s"$work/index", s"$work/kept")
              .select(concat(col("source"), lit("-"), col("doc_id")).as("stream_name"),
                to_json(struct(col("doc_id"), col("source"), col("text"))).as("value"))
          case None =>
            functions.SpanCodec.renderSpans(
              page.select(col("stream_name"), col("idx"), col("event_type"), col("data")))
        }
        functions.SpanCodec.toKafkaFrame(rendered, if (gateBatch.isDefined) "corpus" else "events")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$topicDir/batch=$batchId")
        pages += 1; rows += ctx.items
        checkpoint() // fenced CAS: continuation advances only after the writes
      }

    // the session's Hadoop conf, not `new Configuration()`: an hdfs://
    // or object-store lease dir must see spark.hadoop.* settings
    // (nameservices, credentials) exactly as the data paths do
    val leases = new LeaseStore(s"$work/leases", spark.sessionState.newHadoopConf())
    val proc = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", nRanges,
      leases, "sync-feed", "tool-1", leaseTtlMs = 60000L, maxItems = maxItems,
      handler = handler, clock = () => System.currentTimeMillis())
    val t0 = System.nanoTime()
    val polls = proc.runUntilCaughtUp()
    val secs = (System.nanoTime() - t0) / 1e9
    proc.stop()
    val produced = spark.read.parquet(topicDir).count()
    println(s"[sync-feed] caught up: polls=$polls pages=$pages rows=$rows " +
      s"produced=$produced secs=${math.round(secs * 1000) / 1000.0} " +
      s"rows_per_sec=${if (secs > 0) (rows / secs).round else 0} topic=$topicDir")
    if (canonical) canonicalize(spark, work, gate)
  }

  /** `--canonical` post-pass (SCALING.md round-14 follow-up 4
    * addendum): gated sync-feed resume is SET-equivalent by design —
    * first-admitted-wins dedup across independently checkpointed
    * ranges may keep a different cluster representative after a crash
    * changes the inter-range admission interleaving. This pass makes
    * the output content-identical when an operator wants
    * md5-comparable reruns: over kept ∪ quarantine (which partition
    * the corpus — the gate's invariant), rebuild the gate's signature
    * buckets, connect docs sharing any bucket (the bounded CC batch
    * job), and keep the deterministic min-doc_id representative per
    * component. The result is a pure function of the corpus, not of
    * admission order, so ANY run — killed, resumed, or uninterrupted —
    * lands the same `canonical/kept` set. (Count may differ slightly
    * from the streaming gate's kept count: CC resolves transitive
    * chains the pessimistic in-batch tie rule over-drops, exactly as
    * the batch resolver does.) */
  private def canonicalize(spark: SparkSession, work: String, gate: String): Unit = {
    import graft.streaming.{ExactDupStream, NearDupStream, SimhashDupStream, WinnowDupStream}
    val sig: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = gate match {
      case "neardup" => NearDupStream.bucketIndex
      case "exact" => ExactDupStream.md5Buckets
      case "simhash" => SimhashDupStream.simhashKeys
      case "winnow" => WinnowDupStream.winnowKeys
      case other => throw new IllegalArgumentException(s"no canonical pass for gate '$other'")
    }
    val cols = Seq("doc_id", "source", "text").map(col)
    val kept = spark.read.parquet(s"$work/kept").select(cols: _*)
    val qPath = new org.apache.hadoop.fs.Path(s"$work/quar")
    val qfs = qPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = (if (qfs.exists(qPath))
      kept.unionByName(spark.read.parquet(s"$work/quar").select(cols: _*))
    else kept).localCheckpoint() // corpus partition: scanned by sig + join + write
    val buckets = sig(all.select(col("doc_id"), col("text")))
    // one edge per (doc, bucket) to the bucket's min doc: the standard
    // star edge set, |edges| ≤ |bucket rows|, never pairwise
    val bmin = buckets.groupBy(col("band"), col("bucket")).agg(min(col("doc_id")).as("m"))
    val edges = buckets.join(bmin, Seq("band", "bucket"))
      .where(col("doc_id") =!= col("m"))
      .select(col("doc_id").as("a"), col("m").as("b")).distinct()
    val comp = graft.operators.SimilarityQueries.componentMapFromEdges(edges)
    val canonical = all.join(comp, all("doc_id") === comp("node"), "left")
      // a doc outside every cluster keeps itself; in a cluster, only
      // the component root (= min doc_id) survives
      .where(col("component").isNull || col("component") === col("doc_id"))
      .select(cols: _*)
    canonical.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$work/canonical/kept")
    // order-independent digest (bit-xor of per-row hashes — ANSI-safe,
    // no overflow): cluster-scale safe, no driver-side sort/collect
    val row = spark.read.parquet(s"$work/canonical/kept")
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(doc_id, source, text))").as("digest"))
      .first()
    println(s"[sync-feed] canonical kept=${row.getLong(0)} digest=${row.getLong(1)}")
  }

  private def withSpark[A](f: SparkSession => A): A = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-tool")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try f(spark) finally spark.stop()
  }
}
