package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The DynamoStore Indexer/Notifier Lambda semantics, Spark-first —
  * the last piece of the reference's index pipeline
  * (src/Propulsion.DynamoStore.Indexer/Handler.fs:6-55,
  * src/Propulsion.DynamoStore.Notifier/Handler.fs:13-60,
  * AppendsEpoch.fs:14-29, Types.fs:30-50).
  *
  * In the reference, DynamoDB Streams triggers two Lambdas with the
  * table's change records (NEW_IMAGE of the Equinox batch schema —
  * keys `p` stream, `n` version-after-write, `a` appended-event
  * count, `c` batch event types):
  *
  *  - the INDEXER parses each record into the appended StreamSpan
  *    (`p`, `i = n - a`, the last `a` event types) — skipping REMOVEs,
  *    index/system streams (`$`-prefixed), and unfold-only syncs
  *    (`a = 0`) — and ingests the spans into the AppendsEpoch chain
  *    (this engine's q09_epoch_ingest overlap-trim);
  *  - the NOTIFIER watches the INDEX table's change records, computes
  *    each partition's new tail checkpoint
  *    (`isClosed ? (epoch+1)·1M : epoch·1M + version` —
  *    Checkpoint.positionOfEpochClosedAndVersion, Types.fs:40-44;
  *    closed = the batch's last event type is "Closed"), keeps the
  *    per-partition MAX, and publishes (partition, position) to an
  *    SNS FIFO topic with MessageDeduplicationId = partition+position
  *    so redelivered triggers never double-notify.
  *
  * Here the "trigger" is any change-record frame — a
  * [[graft.sources.ChangeFeedProcessor]] page over the store's change
  * feed is the natural source (the DDB-streams analogue), and the
  * parses are plain narrow column transforms (no shuffle until the
  * per-partition max). The topic is a parquet append with the same
  * batch-scoped-overwrite + marker idempotency the dup-gate sinks
  * prove, plus the FIFO dedup: a (partition, position) pair already
  * on the topic is never appended again, whatever batch it arrives
  * in.
  */
object IndexNotifier {

  val EpochCategory = "$AppendsEpoch"
  val IndexCategory = "$AppendsIndex"

  /** Checkpoint encoding base (Types.fs:33 MaxItemsPerEpoch — "defines
    * how Checkpoints are encoded, so cannot be changed"). */
  val MaxItemsPerEpoch = 1000000L

  /** The Indexer Lambda's parse (Handler.fs:6-49): change records →
    * appended spans (p, i, c). REMOVEs, `$`-prefixed index/system
    * streams, and zero-append (unfold-only) writes drop; `i` is
    * `n - a` and `c` the LAST `a` event types of the batch — the
    * events this write appended, not the whole batch. */
  def parseAppendSpans(changes: DataFrame): DataFrame =
    changes
      .where(col("op").isin("INSERT", "MODIFY"))
      .where(!col("p").startsWith("$"))
      .where(coalesce(col("a"), lit(0L)) > 0)
      .select(
        col("p"),
        (col("n") - col("a")).as("i"),
        expr("slice(c, size(c) - CAST(a AS INT) + 1, CAST(a AS INT))").as("c"))

  /** The Notifier Lambda's parse (Handler.fs:13-57): epoch-stream
    * change records → one (partition, position) tail per partition.
    * Stream name `\$AppendsEpoch-{partition}_{epoch}`; checkpoint =
    * (epoch+1)·1M when the write closed the epoch (last batch event
    * type "Closed"), else epoch·1M + n; ties resolve to the MAX per
    * partition (updateTails). */
  def partitionTails(changes: DataFrame): DataFrame =
    changes
      .where(col("op").isin("INSERT", "MODIFY"))
      .where(col("p").startsWith(EpochCategory + "-"))
      .where(coalesce(col("a"), lit(0L)) > 0)
      .select(
        expr(s"substring(p, ${EpochCategory.length + 2})").as("sid"),
        col("n"), col("c"))
      .select(
        expr("substring_index(sid, '_', 1)").as("partition"),
        expr("CAST(substring_index(sid, '_', -1) AS BIGINT)").as("epoch"),
        (element_at(col("c"), -1) === lit("Closed")).as("closed"),
        col("n"))
      .select(col("partition"),
        when(col("closed"), (col("epoch") + 1) * MaxItemsPerEpoch)
          .otherwise(col("epoch") * MaxItemsPerEpoch + col("n")).as("position"))
      .groupBy(col("partition"))
      .agg(max(col("position")).as("position"))

  /** Publish tails to the topic with FIFO-dedup semantics
    * (Handler.fs:62-69: MessageDeduplicationId = partition+position):
    * pairs already on the topic never re-publish, and a redelivered
    * batch is a no-op (marker) / an idempotent overwrite (batch
    * subdir). Returns the number of newly published notifications. */
  def notify(tails: DataFrame, topicDir: String, batchId: Long): Long = {
    val spark = tails.sparkSession
    // marker/listing I/O through the topic dir's own Hadoop FileSystem
    // (the CheckpointStore/NearDupStream discipline): works unchanged
    // for an hdfs:// topic instead of writing markers to local disk
    val root = new org.apache.hadoop.fs.Path(topicDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, s"_batches/batch-$batchId")
    if (fs.exists(marker)) return 0L
    val hasBatches = fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("batch="))
    val fresh =
      if (!hasBatches) tails
      else {
        val seen = spark.read.parquet(topicDir)
          .where(col("batch") =!= lit(batchId))
          .select(col("partition"), col("position"))
        tails.join(seen, Seq("partition", "position"), "left_anti")
      }
    val out = fresh.localCheckpoint() // count + write read one materialization
    val n = out.count()
    out.write.mode(SaveMode.Overwrite).parquet(s"$topicDir/batch=$batchId")
    fs.mkdirs(marker.getParent)
    fs.createNewFile(marker)
    n
  }
}
