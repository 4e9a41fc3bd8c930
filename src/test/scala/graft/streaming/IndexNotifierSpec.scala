package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The DynamoStore Indexer/Notifier Lambda semantics (SURVEY §2.6's
  * last row): change-record parsing into appended spans, per-partition
  * tail checkpoints with the closed-epoch encoding, FIFO-dedup'd
  * notification publishing, and the change-feed trigger wiring. */
class IndexNotifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-indexnotifier-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-inx-$tag").toString

  private def changes(rows: Seq[(String, String, Long, Option[Long], Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("op", "p", "n", "a", "c")
  }

  test("indexer parse: appended span = (p, n-a, last a event types); removes/system/unfold-only drop") {
    import spark.implicits._
    val batch = changes(Seq(
      ("INSERT", "Account-a1", 5L, Some(2L), Seq("Opened", "Credited", "Debited", "X", "Y")),
      ("MODIFY", "Account-a2", 3L, Some(3L), Seq("e1", "e2", "e3")),
      ("REMOVE", "Account-a3", 9L, Some(1L), Seq("Gone")),
      ("INSERT", "$AppendsEpoch-0_0", 4L, Some(1L), Seq("Ingested")),
      ("INSERT", "$ReaderCheckpoint-g1", 2L, Some(1L), Seq("Checkpointed")),
      ("MODIFY", "Order-o1", 6L, Some(0L), Seq("Placed")), // unfold-only sync
      ("MODIFY", "Order-o2", 6L, None, Seq("Placed"))))    // calf write: no `a`
    val spans = IndexNotifier.parseAppendSpans(batch)
      .as[(String, Long, Seq[String])].collect().toSet
    assert(spans == Set(
      ("Account-a1", 3L, Seq("X", "Y")),
      ("Account-a2", 0L, Seq("e1", "e2", "e3"))))
  }

  test("notifier parse: per-partition max tail; Closed advances to the next epoch's base") {
    import spark.implicits._
    val M = IndexNotifier.MaxItemsPerEpoch
    val batch = changes(Seq(
      ("INSERT", "$AppendsEpoch-0_2", 100L, Some(1L), Seq("Ingested")),
      ("MODIFY", "$AppendsEpoch-0_2", 150L, Some(2L), Seq("Ingested", "Closed")),
      ("INSERT", "$AppendsEpoch-1_0", 7L, Some(1L), Seq("Ingested")),
      ("INSERT", "$AppendsIndex-0", 3L, Some(1L), Seq("Started")), // index index: not a tail
      ("INSERT", "Account-a1", 5L, Some(1L), Seq("Opened")),       // data stream: not a tail
      ("MODIFY", "$AppendsEpoch-1_0", 9L, Some(0L), Seq("Ingested")))) // no events appended
    val tails = IndexNotifier.partitionTails(batch)
      .as[(String, Long)].collect().toMap
    // partition 0: max(2M+100, closed→3M) = 3M; partition 1: 0M+7
    assert(tails == Map("0" -> 3L * M, "1" -> 7L))
  }

  test("notify: FIFO dedup across batches, no-op redelivery, idempotent redo") {
    import spark.implicits._
    val topic = tmp("topic")
    val M = IndexNotifier.MaxItemsPerEpoch
    val t0 = Seq(("0", 3L * M), ("1", 7L)).toDF("partition", "position")
    assert(IndexNotifier.notify(t0, topic, 0L) == 2L)
    // batch 1 re-announces (0, 3M) — the dedup id already published —
    // plus a genuinely new tail for partition 1
    val t1 = Seq(("0", 3L * M), ("1", 9L)).toDF("partition", "position")
    assert(IndexNotifier.notify(t1, topic, 1L) == 1L)
    val topicRows = spark.read.parquet(topic)
      .select(col("partition"), col("position")).as[(String, Long)].collect().toSet
    assert(topicRows == Set(("0", 3L * M), ("1", 7L), ("1", 9L)))
    // redelivered batch: marker makes it a no-op
    assert(IndexNotifier.notify(t0, topic, 0L) == 0L)
    // crash-redo: marker gone, the redone batch rewrites ITS OWN subdir
    // identically (its pairs are absent from the OTHER batches)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$topic/_batches/batch-0"))
    assert(IndexNotifier.notify(t0, topic, 0L) == 2L)
    val after = spark.read.parquet(topic)
      .select(col("partition"), col("position")).as[(String, Long)].collect().toSet
    assert(after == topicRows, "redo changed the topic contents")
  }

  test("change-feed trigger wiring: a processor page notifies tails, redelivery never double-publishes") {
    import graft.sources.{ChangeFeed, ChangeFeedProcessor, LeaseStore}
    import spark.implicits._
    val M = IndexNotifier.MaxItemsPerEpoch
    // the index table's change feed: epoch-stream writes across two
    // token ranges, with a position column for paging
    val feed = ChangeFeed.withRanges(
      Seq(
        (0L, "INSERT", "$AppendsEpoch-0_0", 10L, Some(1L), Seq("Ingested")),
        (1L, "MODIFY", "$AppendsEpoch-0_0", 25L, Some(1L), Seq("Ingested")),
        (2L, "INSERT", "$AppendsEpoch-1_0", 5L, Some(2L), Seq("Ingested", "Closed")),
        (3L, "INSERT", "Account-a1", 2L, Some(1L), Seq("Opened")))
        .toDF("pos", "op", "p", "n", "a", "c"),
      "p", 2)
    val feedDir = tmp("cf-feed")
    feed.write.mode(SaveMode.Overwrite).partitionBy("range_id").parquet(feedDir)
    val topic = tmp("cf-topic")
    val proc = new ChangeFeedProcessor(spark, feedDir, "range_id", "pos", 2,
      new LeaseStore(tmp("cf-leases")), "grp", "notifier-1", 60000L, 100,
      handler = (ctx, page, checkpoint) => {
        // the Lambda body: parse tails, publish, then checkpoint the
        // page. The batch key composes (rangeId, epoch) — pages of
        // DIFFERENT token ranges may share a max position, and each
        // must own its topic subdir
        IndexNotifier.notify(IndexNotifier.partitionTails(page),
          topic, ctx.rangeId * (1L << 40) + ctx.epoch)
        checkpoint()
      },
      clock = () => 1000L)
    proc.pollOnce()
    val rows = spark.read.parquet(topic)
      .select(col("partition"), col("position")).as[(String, Long)].collect().toSet
    assert(rows == Set(("0", 25L), ("1", 1L * M)))
    // a second poll re-reads nothing (checkpointed) → topic unchanged
    proc.pollOnce()
    assert(spark.read.parquet(topic)
      .select(col("partition"), col("position")).as[(String, Long)].collect().toSet == rows)
  }
}
