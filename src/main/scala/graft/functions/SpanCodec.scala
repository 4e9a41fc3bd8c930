package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire codec for stream spans — the Kafka span format of the reference
  * (`RenderedSpan {s, i, e:[{c,d}]}`, src/Propulsion.Kafka/Codec.fs:46-75)
  * as pure Catalyst expressions: `to_json(struct(...))` on render,
  * `from_json` + `posexplode` on parse (index = i + pos).
  *
  * Everything stays codegen'd; rendering shuffles once on the stream key
  * (map-side combinable collect_list), parsing is a narrow generator.
  */
object SpanCodec {

  val wireSchema: StructType = StructType(Seq(
    StructField("s", StringType),
    StructField("i", LongType),
    StructField("e", ArrayType(StructType(Seq(
      StructField("c", StringType),
      StructField("d", StringType)))))))

  /** Render one span per stream from envelope rows
    * (stream_name, idx, event_type, data). Events are sorted by idx via
    * array_sort on (idx, c, d) structs — deterministic without a
    * sort-within-group shuffle. */
  def renderSpans(env: DataFrame): DataFrame =
    env
      .groupBy(col("stream_name"))
      .agg(min(col("idx")).as("i"),
        array_sort(collect_list(struct(col("idx"), col("event_type").as("c"),
          col("data").as("d")))).as("evs"))
      .select(col("stream_name"),
        to_json(struct(
          col("stream_name").as("s"), col("i"),
          expr("transform(evs, x -> struct(x.c AS c, x.d AS d))").as("e")))
          .as("value"))

  /** Parse rendered span JSON back to envelope rows; index = i + pos
    * (Codec.fs:63-68 enum semantics). */
  def parseSpans(rendered: DataFrame, valueCol: String = "value"): DataFrame =
    rendered
      .select(from_json(col(valueCol), wireSchema).as("sp"))
      .select(col("sp.s").as("stream_name"), col("sp.i").as("i"),
        posexplode(col("sp.e")).as(Seq("pos", "ev")))
      .select(col("stream_name"), (col("i") + col("pos")).as("idx"),
        col("ev.c").as("event_type"), col("ev.d").as("data"))
}
