package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical event envelope for the engine.
  *
  * Mirrors the reference's timeline-event envelope (jet/propulsion
  * src/Propulsion/Streams.fs:150, src/Propulsion/Sinks.fs:33): a fixed
  * envelope around an opaque payload, ordered per stream by a 0-based
  * contiguous index, with snapshot-style "unfold" rows carried alongside.
  *
  * Row-oriented: one event = one record; `data`/`meta` are opaque JSON.
  */
final case class TimelineEvent(
    streamName: String,
    category: String,
    streamId: String,
    index: Long,
    eventType: String,
    data: String,
    meta: String,
    eventId: String,
    timestamp: java.sql.Timestamp,
    isUnfold: Boolean,
    size: Int)

object TimelineEvent {
  val schema: StructType = StructType(Seq(
    StructField("streamName", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("streamId", StringType, nullable = false),
    StructField("index", LongType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("data", StringType),
    StructField("meta", StringType),
    StructField("eventId", StringType),
    StructField("timestamp", TimestampType),
    StructField("isUnfold", BooleanType, nullable = false),
    StructField("size", IntegerType, nullable = false)))
}

/** Builders mapping the driver test tables onto the envelope. */
object Envelope {

  /** Lift the raw `events` table (event_id, ts, user_id, event_type, value,
    * props) into the canonical envelope.
    *
    * The per-stream index is synthesized exactly like the reference does for
    * index-less feeds (Kafka `StreamNameSequenceGenerator`,
    * src/Propulsion.Kafka/Consumers.fs:268-332): a monotonic 0-based
    * row_number per stream in arrival order `(ts, event_id)`.
    *
    * Scale note: the window shuffles by user_id once; every downstream
    * per-stream operator reuses that hash partitioning, so the synthesis
    * costs a single shuffle at 100 TB, not one per operator.
    */
  def fromEvents(events: DataFrame): DataFrame = {
    // Order by the raw nanosecond value when present: the micro-truncated
    // timestamp could invert events <1us apart, desynchronizing the
    // synthesized index from a full-precision oracle.
    val arrivalOrder =
      if (events.columns.contains("ts_ns")) col("ts_ns") else col("ts")
    val byStream = Window.partitionBy(col("user_id")).orderBy(arrivalOrder, col("event_id"))
    events
      .withColumn("stream_name", concat(lit("user-"), col("user_id")))
      .withColumn("category", lit("user"))
      .withColumn("stream_id", col("user_id").cast(StringType))
      .withColumn("idx", row_number().over(byStream).cast(LongType) - 1L)
      .withColumn("is_unfold", lit(false))
      .withColumn("size", (octet_length(col("props")) + lit(16)).cast(IntegerType))
  }

  /** Read one of the driver test tables.
    *
    * `events.ts` has been written two different ways across fixture
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader only accepts as a raw long — and plain micros
    * TIMESTAMP(_NTZ). Branch on the ACTUAL column type so either
    * generation loads into the identical envelope: `ts` always a
    * (UTC-instant) TimestampType, `ts_ns` always the full-precision
    * nanosecond long that `fromEvents` uses as its arrival-order
    * tie-break. All engine entry points pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ→instant cast reads
    * the stored wall-clock as UTC — the same instants the old
    * nanos-as-long path produced. Regression: FixtureSchemaSpec writes
    * one fixture of each generation and asserts identical envelopes.
    */
  def readTable(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case LongType => // nanos-as-long fixture generation
          df.withColumn("ts_ns", col("ts"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: TimestampNTZType =>
          val tsUtc = col("ts").cast(TimestampType)
          df.withColumn("ts_ns", unix_micros(tsUtc) * lit(1000L))
            .withColumn("ts", tsUtc)
        case _: TimestampType =>
          df.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported fixture type $other (expected long nanos or timestamp)")
      }
    } else df
  }
}
