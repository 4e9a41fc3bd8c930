package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q16_session's density gate (round 19, VERDICT r18 #7): one plan per
  * density regime, one answer everywhere. The gate picks the classic
  * one-phase gaps-and-islands when fragments ≈ events (sparse — the
  * two-phase exchange buys nothing, measured ~1.15× tax at sf0.1) and
  * the skew-immune two-phase bucket plan when phase 1 actually
  * collapses rows (dense — the 60× hot-user case). Correctness must
  * not depend on which side fires, so this spec drives BOTH sides on
  * fixtures engineered to trip each branch and pins their outputs to
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

  /** Write a synthetic events.parquet the envelope reader accepts and
    * run q16Session over it; return (gate fired dense?, result set).
    * Branch detection: only the two-phase plan keeps the `_b` bucket
    * column past optimization (one-phase selects it but never uses it,
    * so column pruning removes it). */
  private def drive(name: String, evs: Seq[(Long, Long, Long, Double)])
      : (Boolean, Set[(String, Long, Long, Long, Double)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"sessgate-$name").toString
    evs.toDF("event_id", "user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = EventTimeQueries.q16Session.build(spark, dir)
    val densePlan = df.queryExecution.optimizedPlan.toString.contains("_b")
    val out = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    (densePlan, out)
  }

  test("sparse fixture (events ≈ buckets) takes the one-phase branch and matches the reference") {
    // 40 users × 6 events each, 3h apart: every event its own bucket
    // AND its own session; density ratio 1.0 → one-phase fires.
    val evs = for {
      u <- 0L until 40L
      i <- 0L until 6L
    } yield (u * 10 + i, u, (i * 3 + u % 3) * gapUs + u * 1000L, (u + i).toDouble / 4)
    val expect = reference(evs.map { case (_, u, ts, v) =>
      (s"user-$u", ts, BigDecimal(v).setScale(4)) })
    val (dense, out) = drive("sparse", evs)
    assert(!dense, "density ratio 1.0 must take the one-phase branch")
    assert(out == expect)
  }

  test("dense fixture (many events per bucket) takes the two-phase branch and matches the reference") {
    // 8 users × 900 events packed into 3 active hours with one 2h gap:
    // ~300 events per (user,bucket) → two-phase fires; the gap splits
    // each user into exactly two sessions whose boundary crosses a
    // bucket edge (the construction the fragment merge must get right).
    val evs = for {
      u <- 0L until 8L
      i <- 0L until 900L
    } yield {
      val inFirst = i < 500
      val base = if (inFirst) 0L else 4L * gapUs // 2h+ gap after hour ~2
      val ts = base + (i % 500) * (2 * gapUs / 500) + u * 7L
      (u * 1000 + i, u, ts, (i % 13).toDouble / 4)
    }
    val expect = reference(evs.map { case (_, u, ts, v) =>
      (s"user-$u", ts, BigDecimal(v).setScale(4)) })
    val (dense, out) = drive("dense", evs)
    assert(dense, "~300 events per bucket must take the two-phase branch")
    assert(out == expect)
  }

  test("sparse-but-skewed fixture trips the per-stream guard: two-phase despite global ratio ≈ 1") {
    // one hot user with 300k events, one per bucket (nothing collapses;
    // global ratio ~1.0) + 50 background users. The r17 catastrophe
    // shape: one-phase would sort the hot user's whole history in a
    // single partition, so term 2 (maxStream > max(250k, 2n/parallelism))
    // must force the two-phase branch even though term 1 says sparse.
    // Generated THROUGH Spark (a 300k-row LocalRelation embedded in the
    // plan is pathologically slow); expected values asserted as the
    // construction's invariants, not a materialized 300k-row set.
    val hotN = 300000L
    val dir = java.nio.file.Files.createTempDirectory("sessgate-skewed").toString
    val hot = spark.range(hotN).select(col("id").as("event_id"),
      lit(42L).as("user_id"), (col("id") * gapUs).as("ts_us"), lit(0.25).as("value"))
    val bg = spark.range(50).select((col("id") + 1000000L).as("event_id"),
      (col("id") + 100L).as("user_id"), (col("id") * 3 * gapUs).as("ts_us"),
      lit(1.0).as("value"))
    hot.union(bg)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = EventTimeQueries.q16Session.build(spark, dir)
    assert(df.queryExecution.optimizedPlan.toString.contains("_b"),
      "a 300k-event stream must force the two-phase branch")
    // gap exactly 1h everywhere → every hot event is its own session
    val hotAgg = df.filter(col("stream_name") === "user-42")
      .agg(count(lit(1)), sum(col("n")), sum(col("sum_value")),
        min(col("session_start_us")), max(col("last_event_us"))).head()
    assert(hotAgg.getLong(0) == hotN, "every hot event its own session")
    assert(hotAgg.getLong(1) == hotN)
    assert(math.abs(hotAgg.getDouble(2) - hotN * 0.25) < 1e-6)
    assert(hotAgg.getLong(3) == 0L && hotAgg.getLong(4) == (hotN - 1) * gapUs)
    // background users: one single-event session each
    assert(df.filter(col("stream_name") =!= "user-42").count() == 50L)
  }

  test("boundary behavior: a gap of exactly 1h splits, a hair under merges — on both branches") {
    // two events exactly gap apart (split) and two at gap-1us (merge),
    // replicated at both densities by padding the dense variant
    def base(u: Long) = Seq(
      (u * 10 + 1, u, 0L, 1.0), (u * 10 + 2, u, gapUs, 1.0),          // split
      (u * 10 + 3, u, 3 * gapUs, 1.0), (u * 10 + 4, u, 4 * gapUs - 1, 1.0)) // merge
    val sparse = (0L until 30L).flatMap(base) // density 1.0 → one-phase
    val dense = base(0) ++ (0L until 600L).map(i =>
      (1000 + i, 99L, 6 * gapUs + i, 0.25)) // hot bucket → two-phase
    for ((tag, evs) <- Seq(("sparse", sparse), ("dense", dense))) {
      val expect = reference(evs.map { case (_, u, ts, v) =>
        (s"user-$u", ts, BigDecimal(v).setScale(4)) })
      val (firedDense, out) = drive(s"edge-$tag", evs)
      assert(firedDense == (tag == "dense"), s"branch selection for $tag")
      assert(out == expect, s"branch=$tag")
    }
  }
}
