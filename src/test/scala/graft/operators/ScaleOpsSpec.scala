package graft.operators

import java.nio.file.Files

import graft.sources.PeriodicSnapshotSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path behaviors: bucketed joins avoid shuffles, the periodic
  * snapshot source advances its traversal-time base across restarts. */
class ScaleOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-scaleops-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join with no shuffle exchange; results match plain join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_b", 8, Seq("l_orderkey"))

    val plain = li.join(o, Seq("l_orderkey")).count()
    val colocated = spark.conf.get("spark.sql.autoBroadcastJoinThreshold") match {
      case _ =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try Bucketing.colocatedJoin(spark, "li_b", "o_b", Seq("l_orderkey"))
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
    assert(!Bucketing.hasShuffle(colocated), colocated.queryExecution.executedPlan.toString)
    assert(colocated.count() == plain)
  }

  test("q20 bucketed re-register drops a stale catalog entry at an old location") {
    // scenario: a fixture regenerated within a JVM whose catalog
    // persists across sessions — the table NAME is fingerprint-free, so
    // a stale entry can point at an older fingerprint's location; a
    // bare CREATE TABLE IF NOT EXISTS would no-op on it and q20 would
    // silently read the stale data
    val dir = "/root/testdata/sf0.001"
    val s2 = spark.newSession()
    val want = graft.SparkEntry.queries("q20_bucket_join")(s2, dir)
      .collect().map(_.toString).toVector
    assert(want.nonEmpty)
    // plant a decoy: same table names, DIFFERENT location with 1-row
    // decoy data of the right shape (the in-memory external catalog is
    // shared across newSession(), like a persistent metastore)
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val bogus = Files.createTempDirectory("graft-bogus-bucket").toString
    val s3 = spark.newSession()
    s3.sql("SELECT 1L AS o_orderkey, 'X' AS o_orderpriority")
      .write.mode("overwrite").parquet(s"$bogus/orders")
    s3.sql("SELECT 1L AS o_orderkey, CAST(1.0 AS DOUBLE) AS l_extendedprice, " +
        "CAST(0.0 AS DOUBLE) AS l_discount")
      .write.mode("overwrite").parquet(s"$bogus/lineitem")
    for ((t, sub) <- Seq(s"graft_bucket_orders$safe" -> "orders",
        s"graft_bucket_lineitem$safe" -> "lineitem")) {
      s3.sql(s"DROP TABLE IF EXISTS $t")
      val schema = s3.read.parquet(s"$bogus/$sub").schema.toDDL
      s3.sql(s"CREATE TABLE $t ($schema) USING parquet LOCATION '$bogus/$sub'")
    }
    // a fresh session (cache miss) must detect the location mismatch,
    // drop the stale entry and re-register the fingerprinted layout
    val got = graft.SparkEntry.queries("q20_bucket_join")(s3, dir)
      .collect().map(_.toString).toVector
    assert(got == want, s"stale catalog entry served: got ${got.take(3)}")
  }

  test("prefixMaxOfPrevious matches the global running max; no unpartitioned window") {
    import org.apache.spark.sql.expressions.Window
    // ords with gaps + duplicated max values + a null-valued row; small
    // k forces multiple super-buckets so both levels carry weight
    val df = spark.range(0, 500)
      .select((col("id") * 3).as("ord"),
        when(col("id") % 97 === 0, lit(null).cast("long"))
          .otherwise(pmod(col("id") * 2654435761L, lit(1000)).cast("long")).as("v"))
    val got = ScaleOps.prefixMaxOfPrevious(df, "ord", "v", "pm", k = 64)
      .select(col("ord"), col("pm"))
    val ref = df.withColumn("pm",
        max(col("v")).over(Window.orderBy(col("ord"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("ord"), col("pm"))
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
    // first row must keep the no-predecessor null
    assert(got.orderBy(col("ord")).limit(1).collect()(0).isNullAt(1))
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val bad = got.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "operator's own plan has an unpartitioned window")
  }

  test("date-partitioned writes prune partitions on read (PartitionFilters)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val events = graft.model.Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date(col("ts")))
    events.write.partitionBy("event_date").parquet(dir)

    val probe = events.where(col("event_date") === "2024-01-05")
    val expected = probe.count()
    assert(expected > 0)

    val pruned = spark.read.parquet(dir).where(col("event_date") === "2024-01-05")
    assert(pruned.count() == expected)
    // the date predicate must prune at the partition level, not post-scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"))
    // salted-join helper is row-identical to the plain join on this data
    val dim = events.groupBy(col("event_type")).agg(count(lit(1)).as("tt"))
    val saltedN = ScaleOps.saltedJoin(events, dim, "event_type", col("event_id"), 8).count()
    assert(saltedN == events.join(dim, Seq("event_type")).count())
  }

  test("stripedBackfill: parallel chunk reads, strictly ordered delivery") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"))
    val delivered = collection.mutable.Buffer.empty[(Int, Int)]
    graft.sources.Backfill.stripedBackfill(
      li, expr("l_orderkey div 500"), numChunks = 13,
      (c, rows) => delivered += ((c, rows.length)), maxDop = 4)
    assert(delivered.map(_._1).toList == (0 until 13).toList) // gap-free order
    assert(delivered.map(_._2).sum == li.count())             // nothing lost
  }

  test("PeriodicSnapshotSource: full re-crawl per run, epoch base advances across restarts") {
    import spark.implicits._
    val file = Files.createTempFile("snap", ".txt")
    Files.writeString(file, (0 until 5).map(i => s"item-$i").mkString("\n") + "\n")
    val cp = Files.createTempDirectory("cp-periodic").toString
    val out = Files.createTempDirectory("periodic-out").toString

    def crawlOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.PeriodicSnapshotSource")
        .option("path", file.toString).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    crawlOnce()
    val first = spark.read.parquet(out)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(first.length == 5)
    assert(first.map(_._1).distinct.toList == List(1L))
    assert(first.head._3 == 1L * PeriodicSnapshotSource.BasePositionPerEpoch)

    crawlOnce() // restart: next epoch, full re-crawl, indexes advance
    val second = spark.read.parquet(out)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(second.length == 10)
    assert(second.map(_._1).distinct.sorted.toList == List(1L, 2L))
    val epoch2 = second.filter(_._1 == 2L)
    assert(epoch2.head._3 == 2L * PeriodicSnapshotSource.BasePositionPerEpoch)
    // synthetic indexes are globally monotonic across crawls
    assert(second.map(_._3).sorted.toList == second.map(_._3).toList.sorted)
    assert(epoch2.map(_._3).min > first.map(_._3).max)
  }

  test("bloomPrune: result identical to the plain join on a selective dim") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"))
    // selective dim: 1 user in 20
    val dim = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id")).distinct()
      .where(col("user_id") % 20 === 0)
      .withColumn("flag", lit(1L))
    val pruned = ScaleOps.bloomPrune(events, dim, "user_id", expectedKeys = 1000L)
      .select(col("user_id"), col("event_id"), col("flag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val plain = events.join(dim, Seq("user_id"))
      .select(col("user_id"), col("event_id"), col("flag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(pruned.nonEmpty)
    assert(pruned == plain)
  }
}
