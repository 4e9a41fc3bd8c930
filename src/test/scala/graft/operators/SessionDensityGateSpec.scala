package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q16_session's plan gate (round 19, VERDICT r18 #7): one plan per
  * size regime, one answer everywhere. Below 250k total events no
  * stream can exceed the per-stream sort bound the r17 skew curve
  * convicted, so the classic one-phase gaps-and-islands runs (skipping
  * the two-phase form's extra exchange — a measured ~1.15× tax at
  * fixture SFs); at or above the bound the skew-immune two-phase
  * bucket plan runs (measured equal to one-phase on sparse-uniform
  * 60×, strictly better under skew, better when dense). Correctness
  * must not depend on which side fires, so this spec drives BOTH
  * branches on fixtures straddling the gate and pins their outputs to
  * an independent reference sessionization computed locally.
  */
class SessionDensityGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-session-gate-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val gapUs = 3600000000L

  /** Reference sessionization in plain Scala over collected rows:
    * split a user's sorted timestamps on gaps >= 1h, aggregate each
    * island. Independent of every Spark construct under test. */
  private def reference(rows: Seq[(String, Long, BigDecimal)])
      : Set[(String, Long, Long, Long, Double)] =
    rows.groupBy(_._1).iterator.flatMap { case (user, evs) =>
      val sorted = evs.sortBy(_._2)
      val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, BigDecimal)]]) {
        case (acc, (_, ts, v)) =>
          if (acc.nonEmpty && ts - acc.last.last._1 < gapUs)
            acc.init :+ (acc.last :+ (ts, v))
          else acc :+ Vector((ts, v))
      }
      sessions.map { s =>
        (user, s.head._1, s.last._1, s.size.toLong, s.map(_._2).sum.toDouble)
      }
    }.toSet

  /** Write an events.parquet the envelope reader accepts from a frame
    * of (event_id, user_id, ts_us, value) — generated THROUGH Spark
    * (a six-digit-row LocalRelation embedded in a plan is
    * pathologically slow) — and build q16Session over it. Branch
    * detection: only the two-phase plan keeps the `_b` bucket column
    * past optimization (one-phase never references it, so column
    * pruning removes it). */
  private def drive(name: String, evs: DataFrame): (Boolean, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory(s"sessgate-$name").toString
    evs
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = EventTimeQueries.q16Session.build(spark, dir)
    (df.queryExecution.optimizedPlan.toString.contains("_b"), df)
  }

  private def localDf(evs: Seq[(Long, Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    evs.toDF("event_id", "user_id", "ts_us", "value")
  }

  private def collected(df: DataFrame): Set[(String, Long, Long, Long, Double)] =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet

  test("below the size gate the one-phase branch fires and matches the reference") {
    // 40 users × 6 events each, 3h apart — far under 250k rows
    val evs = for {
      u <- 0L until 40L
      i <- 0L until 6L
    } yield (u * 10 + i, u, (i * 3 + u % 3) * gapUs + u * 1000L, (u + i).toDouble / 4)
    val expect = reference(evs.map { case (_, u, ts, v) =>
      (s"user-$u", ts, BigDecimal(v).setScale(4)) })
    val (dense, df) = drive("sparse", localDf(evs))
    assert(!dense, "240 rows must take the one-phase branch")
    assert(collected(df) == expect)
  }

  test("above the size gate the two-phase branch fires and matches the reference — including gap boundaries") {
    // 8 users × 36k dense events (≥250k total → two-phase) packed into
    // ~2 active hours with one 2h+ gap mid-stream, PLUS two boundary
    // users: 100 with a gap of exactly 1h (must split) and 101 with a
    // hair under (must merge). Generated through Spark; the reference
    // runs over the parquet rows read back (few hundred k rows, ~20
    // output sessions).
    val per = 18000L
    val step = 2 * gapUs / per // 0.4 s between a user's events — dense
    val dense8 = spark.range(8L * 36000L).select(
      col("id").as("event_id"),
      (col("id") % 8).as("user_id"),
      (when(expr("id div 8") < per, lit(0L)).otherwise(lit(4L * gapUs)) +
        (expr("id div 8") % per) * step + (col("id") % 8) * 7L).as("ts_us"),
      ((col("id") % 13).cast("double") / 4).as("value"))
    val boundary = localDf(Seq(
      (900001L, 100L, 0L, 1.0), (900002L, 100L, gapUs, 1.0),
      (900003L, 101L, 10 * gapUs, 1.0), (900004L, 101L, 11 * gapUs - 1, 1.0)))
    val (dense, df) = drive("dense", dense8.union(boundary))
    assert(dense, "288k rows must take the two-phase branch")
    // reference from the same generated rows, collected once
    val expect = reference(
      dense8.union(boundary).collect().toSeq.map { r =>
        (s"user-${r.getLong(1)}", r.getLong(2), BigDecimal(r.getDouble(3)).setScale(4))
      })
    assert(collected(df) == expect)
    // the boundary users' shape, asserted explicitly
    val u100 = collected(df.filter(col("stream_name") === "user-100"))
    assert(u100.size == 2, "gap of exactly 1h must split")
    val u101 = collected(df.filter(col("stream_name") === "user-101"))
    assert(u101.size == 1, "gap of 1h minus 1us must merge")
  }

  test("skew above the gate rides the two-phase branch: hot stream cost bounded by buckets") {
    // one hot user with 300k events, one per bucket, + 50 background
    // users — the r17 catastrophe shape. The size gate (300k ≥ 250k)
    // forces two-phase, whose phase-2 input for the hot user is its
    // FRAGMENT count. Expected values asserted as the construction's
    // invariants (every hot event its own session), not a 300k-row set.
    val hotN = 300000L
    val hot = spark.range(hotN).select(col("id").as("event_id"),
      lit(42L).as("user_id"), (col("id") * gapUs).as("ts_us"), lit(0.25).as("value"))
    val bg = spark.range(50).select((col("id") + 1000000L).as("event_id"),
      (col("id") + 100L).as("user_id"), (col("id") * 3 * gapUs).as("ts_us"),
      lit(1.0).as("value"))
    val (dense, df) = drive("skewed", hot.union(bg))
    assert(dense, "300k rows must take the two-phase branch")
    val hotAgg = df.filter(col("stream_name") === "user-42")
      .agg(count(lit(1)), sum(col("n")), sum(col("sum_value")),
        min(col("session_start_us")), max(col("last_event_us"))).head()
    assert(hotAgg.getLong(0) == hotN, "every hot event its own session")
    assert(hotAgg.getLong(1) == hotN)
    assert(math.abs(hotAgg.getDouble(2) - hotN * 0.25) < 1e-6)
    assert(hotAgg.getLong(3) == 0L && hotAgg.getLong(4) == (hotN - 1) * gapUs)
    assert(df.filter(col("stream_name") =!= "user-42").count() == 50L)
  }

  test("boundary behavior on the one-phase branch: exactly 1h splits, a hair under merges") {
    def base(u: Long) = Seq(
      (u * 10 + 1, u, 0L, 1.0), (u * 10 + 2, u, gapUs, 1.0),          // split
      (u * 10 + 3, u, 3 * gapUs, 1.0), (u * 10 + 4, u, 4 * gapUs - 1, 1.0)) // merge
    val evs = (0L until 30L).flatMap(base)
    val expect = reference(evs.map { case (_, u, ts, v) =>
      (s"user-$u", ts, BigDecimal(v).setScale(4)) })
    val (dense, df) = drive("edge-sparse", localDf(evs))
    assert(!dense)
    assert(collected(df) == expect)
  }
}
