package graft.model

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the round-9 fixture-schema break: the driver
  * regenerated `events.parquet` with `ts` as micros TIMESTAMP_NTZ where
  * older generations stored TIMESTAMP(NANOS) (read as a raw long), and
  * `Envelope.readTable`'s unconditional nanos rewrite turned every
  * events query into an analysis error. This spec writes one tiny
  * fixture of EACH generation and asserts both load paths produce
  * byte-identical envelopes — a future fixture regeneration must not be
  * able to zero a round again.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  private def withSpark[T](f: SparkSession => T): T = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-fixture-schema-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    f(s)
  }

  // (event_id, nanos-since-epoch, user_id, event_type, value, props) —
  // nanos deliberately include a sub-microsecond pair (rows 4/5 differ
  // only below micro precision) to pin the documented truncation: the
  // micros generation cannot represent it, so both fixtures are written
  // from the micro-aligned values and compared on those.
  private val rows = Seq(
    (1L, 1700000000000000000L, 10L, "click", 1.0, "{}"),
    (2L, 1700000000001000000L, 10L, "view", 2.0, "{\"k\":1}"),
    (3L, 1700000000002000000L, 11L, "click", 3.0, "{}"),
    (4L, 1700000000003000000L, 11L, "buy", 4.0, "{}"),
    (5L, 1700000000003000000L, 12L, "click", 5.0, "{}"))

  test("nanos-as-long and micros TIMESTAMP_NTZ fixtures load to identical envelopes") {
    withSpark { spark =>
      import spark.implicits._
      val base = Files.createTempDirectory("graft-fixture").toString
      val nanosDir = s"$base/gen-nanos"
      val microsDir = s"$base/gen-micros"

      val raw = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // old generation: ts as a raw long (what TIMESTAMP(NANOS) becomes
      // under spark.sql.legacy.parquet.nanosAsLong=true)
      raw.repartition(1).write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
      // new generation: ts as micros TIMESTAMP_NTZ, like the driver's
      // regenerated /root/testdata fixtures (timestamp[us], no tz)
      raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
        .repartition(1).write.mode("overwrite").parquet(s"$microsDir/events.parquet")

      val fromNanos = Envelope.readTable(spark, nanosDir, "events")
      val fromMicros = Envelope.readTable(spark, microsDir, "events")

      // both paths expose the identical envelope surface
      assert(fromNanos.schema("ts").dataType == TimestampType)
      assert(fromMicros.schema("ts").dataType == TimestampType)
      assert(fromNanos.schema("ts_ns").dataType == LongType)
      assert(fromMicros.schema("ts_ns").dataType == LongType)
      assert(fromNanos.columns.toSeq == fromMicros.columns.toSeq)

      val a = fromNanos.orderBy("event_id").collect()
      val b = fromMicros.orderBy("event_id").collect()
      assert(a.toSeq == b.toSeq)

      // the synthesized per-stream index must agree too (ts_ns is the
      // arrival-order tie-break inside fromEvents)
      val ia = Envelope.fromEvents(fromNanos)
        .select("event_id", "idx").orderBy("event_id").collect()
      val ib = Envelope.fromEvents(fromMicros)
        .select("event_id", "idx").orderBy("event_id").collect()
      assert(ia.toSeq == ib.toSeq)
    }
  }

  test("readTable on the driver fixtures yields a timestamp ts and long ts_ns") {
    withSpark { spark =>
      val df = Envelope.readTable(spark, "/root/testdata/sf0.001", "events")
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.schema("ts_ns").dataType == LongType)
      assert(df.limit(5).count() > 0)
    }
  }
}
