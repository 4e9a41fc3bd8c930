package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire codec for stream spans — the Kafka span format of the reference
  * (`RenderedSpan {s, i, e:[{c,t,d,m}]}`, src/Propulsion.Kafka/Codec.fs:46-75)
  * as pure Catalyst expressions: `to_json(struct(...))` on render,
  * `from_json` + `posexplode` on parse (index = i + pos).
  *
  * Each rendered event carries the reference's full per-event shape:
  * `c` (event type), `t` (timestamp, ISO-8601 with microseconds), `d`
  * (data), `m` (meta). `t`/`m` default to null when the input has no
  * such columns — `to_json` omits null fields, so minimal envelopes
  * still render as the compact `{c,d}` form, and parse fills nulls back.
  *
  * Everything stays codegen'd; rendering shuffles once on the stream key
  * (map-side combinable collect_list), parsing is a narrow generator.
  */
object SpanCodec {

  /** ISO-8601 with microsecond precision — rendered in UTC, round-trips
    * a micro-precision timestamp losslessly. */
  private val isoMicros = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  val wireSchema: StructType = StructType(Seq(
    StructField("s", StringType),
    StructField("i", LongType),
    StructField("e", ArrayType(StructType(Seq(
      StructField("c", StringType),
      StructField("t", StringType),
      StructField("d", StringType),
      StructField("m", StringType)))))))

  /** Render one span per stream from envelope rows
    * (stream_name, idx, event_type, data[, ts, meta]). Events are sorted
    * by idx via array_sort on (idx, ...) structs — deterministic without
    * a sort-within-group shuffle.
    *
    * `coKeys`: raw keys bijective with stream_name (e.g. the user_id the
    * envelope's index window hashed on). Grouping on (coKeys ++
    * stream_name) lets an upstream hash exchange on the raw key satisfy
    * the aggregation's clustering (subset rule) — no re-shuffle on the
    * derived stream name. */
  def renderSpans(env: DataFrame, coKeys: Seq[Column] = Nil): DataFrame = {
    val tCol: Column =
      if (env.columns.contains("ts")) date_format(col("ts"), isoMicros)
      else lit(null).cast(StringType)
    val mCol: Column =
      if (env.columns.contains("meta")) col("meta") else lit(null).cast(StringType)
    env
      .groupBy((coKeys :+ col("stream_name")): _*)
      .agg(min(col("idx")).as("i"),
        array_sort(collect_list(struct(col("idx"), col("event_type").as("c"),
          tCol.as("t"), col("data").as("d"), mCol.as("m")))).as("evs"))
      .select(col("stream_name"),
        to_json(struct(
          col("stream_name").as("s"), col("i"),
          expr("transform(evs, x -> struct(x.c AS c, x.t AS t, x.d AS d, x.m AS m))")
            .as("e")))
          .as("value"))
  }

  /** Parse rendered span JSON back to envelope rows; index = i + pos
    * (Codec.fs:63-68 enum semantics). `ts`/`meta` come back null when
    * the wire event omitted them. */
  def parseSpans(rendered: DataFrame, valueCol: String = "value"): DataFrame =
    rendered
      .select(from_json(col(valueCol), wireSchema).as("sp"))
      .select(col("sp.s").as("stream_name"), col("sp.i").as("i"),
        posexplode(col("sp.e")).as(Seq("pos", "ev")))
      .select(col("stream_name"), (col("i") + col("pos")).as("idx"),
        col("ev.c").as("event_type"), col("ev.d").as("data"),
        to_timestamp(col("ev.t"), isoMicros).as("ts"), col("ev.m").as("meta"))

  /** Adapt rendered spans/summaries to the Kafka producer wire frame
    * (key BINARY, value BINARY, topic STRING) — exactly the columns
    * `df.write.format("kafka")` / `writeStream.format("kafka")`
    * consume. The message key is the STREAM NAME: Kafka's keyed
    * partitioner then guarantees all of a stream's spans land on one
    * partition in append order, which is the total per-stream ordering
    * the reference's ParallelProducerSink relies on
    * (src/Propulsion.Kafka/ProducerSinks.fs:12-30 — key/value render).
    * The broker jar isn't on this container's classpath, so the
    * transport contract (same key → same partition, per-partition
    * append order survives) is pinned by KafkaTransportSpec against a
    * partition-faithful in-memory topic instead of a live broker. */
  def toKafkaFrame(rendered: DataFrame, topic: String,
      keyCol: String = "stream_name", valueCol: String = "value"): DataFrame =
    rendered.select(
      col(keyCol).cast(BinaryType).as("key"),
      col(valueCol).cast(BinaryType).as("value"),
      lit(topic).as("topic"))

  /** RenderedSummary wire shape (`{s, i, u:[{c,t,d,m}]}`,
    * src/Propulsion.Kafka/Codec.fs:78-112): the aggregated state of a
    * stream at version `i` — `i` is the index of the last event the
    * summary reflects, and every `u` entry is a summary (unfold) event
    * AT that version, unlike a span's `e` where events occupy
    * consecutive indexes from `i`. */
  val summarySchema: StructType = StructType(Seq(
    StructField("s", StringType),
    StructField("i", LongType),
    StructField("u", ArrayType(StructType(Seq(
      StructField("c", StringType),
      StructField("t", StringType),
      StructField("d", StringType),
      StructField("m", StringType)))))))

  /** Render one RenderedSummary per stream from summary-event rows
    * (stream_name, idx, event_type, data[, ts, meta]): version
    * `i = max(idx)` (RenderedSummary.ofStreamEvents takes the version
    * of the state the events were produced from), `u` sorted by event
    * type — the summary set is one-per-type, so type order is the
    * deterministic rendering. `coKeys` as in [[renderSpans]]. */
  def renderSummaries(summaries: DataFrame, coKeys: Seq[Column] = Nil): DataFrame = {
    val tCol: Column =
      if (summaries.columns.contains("ts")) date_format(col("ts"), isoMicros)
      else lit(null).cast(StringType)
    val mCol: Column =
      if (summaries.columns.contains("meta")) col("meta") else lit(null).cast(StringType)
    summaries
      .groupBy((coKeys :+ col("stream_name")): _*)
      .agg(max(col("idx")).as("i"),
        array_sort(collect_list(struct(col("event_type").as("c"),
          tCol.as("t"), col("data").as("d"), mCol.as("m")))).as("us"))
      .select(col("stream_name"),
        to_json(struct(col("stream_name").as("s"), col("i"), col("us").as("u")))
          .as("value"))
  }

  /** Parse RenderedSummary JSON back to unfold rows: every summary
    * event bears the summary's version as its index and is an unfold
    * (Codec.fs:106-109 `RenderedSummary.enum`: `TimelineEvent.Create(
    * span.i, ..., isUnfold = true)`). */
  def parseSummaries(rendered: DataFrame, valueCol: String = "value"): DataFrame =
    rendered
      .select(from_json(col(valueCol), summarySchema).as("sm"))
      .select(col("sm.s").as("stream_name"), col("sm.i").as("i"),
        explode(col("sm.u")).as("ev"))
      .select(col("stream_name"), col("i").as("idx"),
        col("ev.c").as("event_type"), col("ev.d").as("data"),
        to_timestamp(col("ev.t"), isoMicros).as("ts"), col("ev.m").as("meta"),
        lit(true).as("is_unfold"))
}
