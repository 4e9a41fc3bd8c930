package graft.operators

import graft.functions.SpanCodec
import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q19: wire-codec and remaining aggregation shapes.
  *
  * The codec round-trip is verified structurally: render every stream's
  * span to RenderedSpan JSON, parse it back, and the output must equal
  * the plain envelope — so the oracle is simply the envelope query. Any
  * render/parse asymmetry (ordering, index arithmetic, escaping) breaks
  * the hash match.
  */
object CodecQueries {

  private def env(spark: SparkSession, dir: String): DataFrame =
    Envelope.fromEvents(ScaleOps.wideRead(spark, dir, "events"))

  val q19CodecRoundtrip: QueryDef = QueryDef(
    "q19_codec_roundtrip",
    """SELECT concat('user-', user_id) AS stream_name,
      |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx,
      |       event_type, props AS data,
      |       epoch_us(ts) AS ts_us
      |FROM events
      |ORDER BY stream_name, idx""".stripMargin) { (spark, dir) =>
    val envelope = env(spark, dir)
      .select(col("user_id"), col("stream_name"), col("idx"), col("event_type"),
        col("props").as("data"), col("ts"))
    SpanCodec.parseSpans(SpanCodec.renderSpans(envelope, coKeys = Seq(col("user_id"))))
      .select(col("stream_name"), col("idx"), col("event_type"), col("data"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("stream_name"), col("idx"))
  }

  // RenderedSummary round-trip (Codec.fs:78-112): the freshest event
  // per (stream, type) — the q05 unfold-retention set — rendered as the
  // stream's summary at version i = stream max(idx), parsed back as
  // unfolds all bearing that version. The oracle computes the same set
  // relationally, so any render/parse asymmetry (type ordering, version
  // arithmetic, escaping) breaks the hash match.
  val q19SummaryRoundtrip: QueryDef = QueryDef(
    "q19_summary_roundtrip",
    """WITH env AS (
      |  SELECT concat('user-', user_id) AS stream_name, user_id,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx,
      |         event_type, props
      |  FROM events)
      |SELECT stream_name, ver, event_type, props AS data
      |FROM (SELECT stream_name, event_type, props,
      |             row_number() OVER (PARTITION BY stream_name, event_type
      |                                ORDER BY idx DESC) AS rn,
      |             max(idx) OVER (PARTITION BY stream_name) AS ver
      |      FROM env) t
      |WHERE rn = 1
      |ORDER BY stream_name, event_type""".stripMargin) { (spark, dir) =>
    // freshest-per-type runs on the envelope's hash(user_id) exchange
    // (subset rule), the summary render groups on the same key
    val byType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("idx").desc)
    val latest = env(spark, dir)
      .withColumn("rn", row_number().over(byType))
      .where(col("rn") === 1)
      .select(col("user_id"), col("stream_name"), col("idx"), col("event_type"),
        col("props").as("data"))
    SpanCodec.parseSummaries(
      SpanCodec.renderSummaries(latest, coKeys = Seq(col("user_id"))))
      .select(col("stream_name"), col("idx").as("ver"), col("event_type"), col("data"))
      .orderBy(col("stream_name"), col("event_type"))
  }

  // grouping-sets coverage beyond rollup: full cube over flag/status
  val q19Cube: QueryDef = QueryDef(
    "q19_cube",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
    ScaleOps.wideRead(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(l_quantity AS DECIMAL(20,4))")).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy(col("flag"), col("status"))
  }

  val all: Seq[QueryDef] = Seq(q19CodecRoundtrip, q19SummaryRoundtrip, q19Cube)
}
