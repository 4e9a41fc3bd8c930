package graft.operators

import graft.functions.StreamFunctions._
import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query families Q1–Q9: the reference's stream-processing semantics
  * re-expressed as relational operators over the `events` table
  * (SURVEY.md §2.12; reference citations inline).
  *
  * Everything here is declarative DataFrame API — Catalyst handles
  * pushdown/pruning; the single shuffle is the per-stream window in
  * [[graft.model.Envelope.fromEvents]], which downstream groupBys reuse.
  */
object StreamQueries {

  /** Shared envelope CTE used by the oracle SQL (must mirror
    * Envelope.fromEvents exactly). */
  private val envSql =
    """WITH env AS (
      |  SELECT concat('user-', user_id) AS stream_name,
      |         'user' AS category,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx,
      |         event_id, ts, user_id, event_type, value, props
      |  FROM events)""".stripMargin

  private def env(spark: SparkSession, dir: String): DataFrame =
    Envelope.fromEvents(ScaleOps.wideRead(spark, dir, "events"))

  // Q1: source scan + projection + predicate (StreamFilter.fs:6-46)
  val q01ScanFilter: QueryDef = QueryDef(
    "q01_scan_filter",
    envSql +
      """
        |SELECT stream_name, idx, event_type, value, epoch_us(ts) AS ts_us
        |FROM env
        |WHERE event_type IN ('purchase', 'click') AND stream_name NOT LIKE '$%'
        |ORDER BY stream_name, idx""".stripMargin) { (spark, dir) =>
    val filter = StreamFilter(allowEventTypes = Seq("purchase", "click"))
    env(spark, dir)
      .where(filter.predicate(col("stream_name"), col("event_type")))
      .select(col("stream_name"), col("idx"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("stream_name"), col("idx"))
  }

  // Q1b: the same scan through StreamFilter's PATTERN path
  // (StreamFilter.fs:16-22): non-plain entries are unanchored regexes
  // (`Regex.IsMatch` ≙ Spark `rlike` ≙ DuckDB `regexp_matches`), plain
  // entries exact values. One pattern per dimension here — an
  // event-type allow mixing a value with a pattern, and a stream-name
  // pattern DENY — so the oracle exercises both partitions.
  val q01ScanFilterRe: QueryDef = QueryDef(
    "q01_scan_filter_re",
    envSql +
      """
        |SELECT stream_name, idx, event_type, value, epoch_us(ts) AS ts_us
        |FROM env
        |WHERE (event_type = 'purchase' OR regexp_matches(event_type, 'cl.*k'))
        |  AND NOT regexp_matches(stream_name, 'user-1\d')
        |  AND stream_name NOT LIKE '$%'
        |ORDER BY stream_name, idx""".stripMargin) { (spark, dir) =>
    val filter = StreamFilter(
      allowEventTypes = Seq("purchase", "cl.*k"), // value + pattern
      denyStreams = Seq("user-1\\d"))             // pattern deny (unanchored)
    env(spark, dir)
      .where(filter.predicate(col("stream_name"), col("event_type")))
      .select(col("stream_name"), col("idx"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("stream_name"), col("idx"))
  }

  // Q2: category extraction (Streams.fs:61-78)
  val q02Categorize: QueryDef = QueryDef(
    "q02_categorize",
    """SELECT split_part(concat(event_type, '-', user_id), '-', 1) AS category,
      |       count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_streams
      |FROM events
      |GROUP BY 1
      |ORDER BY category""".stripMargin) { (spark, dir) =>
    ScaleOps.wideRead(spark, dir, "events")
      .withColumn("raw", concat(col("event_type"), lit("-"), col("user_id")))
      .groupBy(categoryOf(col("raw")).as("category"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_streams"))
      .orderBy(col("category"))
  }

  // Q3: per-stream dedupe by write position (Streams.fs:111-117, 342-346;
  // DOCUMENTATION.md:402-433). "Processed" snapshot = events before the
  // cutoff; redundant re-deliveries (idx < writePos) are discarded.
  val q03DedupeWritePos: QueryDef = QueryDef(
    "q03_dedupe_writepos",
    envSql +
      """,
        |wp AS (
        |  SELECT stream_name, max(idx) + 1 AS write_pos
        |  FROM env WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        |  GROUP BY stream_name)
        |SELECT env.stream_name AS stream_name, count(*) AS accepted,
        |       min(env.idx) AS first_idx, max(env.idx) AS last_idx
        |FROM env LEFT JOIN wp ON env.stream_name = wp.stream_name
        |WHERE env.idx >= coalesce(wp.write_pos, 0)
        |GROUP BY env.stream_name
        |ORDER BY stream_name""".stripMargin) { (spark, dir) =>
    // Single-pass form: the write position is a conditional max over the
    // same per-stream partitioning the envelope window already
    // established — no second scan, no join, no extra shuffle. Partition
    // by user_id, not the derived stream_name: the envelope's index
    // window hashed on user_id, and reusing the same expression lets
    // Catalyst elide the second Exchange+Sort entirely (stream_name is
    // bijective with user_id but Catalyst can't prove it).
    val byStream = Window.partitionBy(col("user_id"))
    env(spark, dir)
      .withColumn("write_pos", coalesce(
        max(when(col("ts") < lit("2024-01-15 00:00:00").cast(TimestampType), col("idx")))
          .over(byStream) + 1L,
        lit(0L)))
      .where(col("idx") >= col("write_pos"))
      .groupBy(col("stream_name"))
      .agg(count(lit(1)).as("accepted"), min(col("idx")).as("first_idx"), max(col("idx")).as("last_idx"))
      .orderBy(col("stream_name"))
  }

  // Q4: span coalescing / gaps-and-islands (Streams.fs:118-147). Simulate
  // partial delivery by dropping every 7th event, then count contiguous
  // islands per stream via the idx - row_number() trick.
  val q04GapsIslands: QueryDef = QueryDef(
    "q04_gaps_islands",
    envSql +
      """,
        |kept AS (SELECT * FROM env WHERE event_id % 7 <> 0),
        |isl AS (
        |  SELECT stream_name,
        |         idx - (row_number() OVER (PARTITION BY stream_name ORDER BY idx) - 1) AS grp,
        |         idx
        |  FROM kept)
        |SELECT stream_name, count(DISTINCT grp) AS n_spans, count(*) AS n_events,
        |       min(idx) AS min_idx, max(idx) AS max_idx
        |FROM isl
        |GROUP BY stream_name
        |ORDER BY stream_name""".stripMargin) { (spark, dir) =>
    // partition by the raw key: the envelope's exchange (hash user_id)
    // already satisfies this clustering, so only a sort is added
    val w = Window.partitionBy(col("user_id")).orderBy(col("idx"))
    env(spark, dir)
      .where(col("event_id") % 7 =!= 0)
      .withColumn("grp", col("idx") - (row_number().over(w).cast(LongType) - 1))
      .groupBy(col("stream_name"))
      .agg(countDistinct(col("grp")).as("n_spans"), count(lit(1)).as("n_events"),
        min(col("idx")).as("min_idx"), max(col("idx")).as("max_idx"))
      .orderBy(col("stream_name"))
  }

  // Q5: unfold retention — only the freshest snapshot per (stream, type)
  // survives (Streams.fs:276-285).
  val q05UnfoldRetention: QueryDef = QueryDef(
    "q05_unfold_retention",
    envSql +
      """
        |SELECT stream_name, event_type, idx AS latest_idx, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY stream_name, event_type
        |                                   ORDER BY idx DESC) AS rn
        |      FROM env) t
        |WHERE rn = 1
        |ORDER BY stream_name, event_type""".stripMargin) { (spark, dir) =>
    // (user_id, event_type) clustering is satisfied by the envelope's
    // hash(user_id) exchange (subset rule) — no second shuffle
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("idx").desc)
    env(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("stream_name"), col("event_type"), col("idx").as("latest_idx"), col("value"))
      .orderBy(col("stream_name"), col("event_type"))
  }

  // Q6: per-stream high-water mark / progress (Streams.fs:262-293, 709-750)
  val q06StreamHwm: QueryDef = QueryDef(
    "q06_stream_hwm",
    envSql +
      """
        |SELECT stream_name, max(idx) + 1 AS write_pos, count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_types
        |FROM env
        |GROUP BY stream_name
        |ORDER BY stream_name""".stripMargin) { (spark, dir) =>
    env(spark, dir)
      .groupBy(col("stream_name"))
      .agg((max(col("idx")) + 1).as("write_pos"), count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("stream_name"))
  }

  // Q7: idempotent-append outcome lattice (CosmosStoreSink.fs:76-83).
  // Incoming span [i,n) vs target max(idx): Ok / Duplicate /
  // PartialDuplicate / PrefixMissing.
  val q07AppendOutcome: QueryDef = QueryDef(
    "q07_append_outcome",
    envSql +
      """,
        |target AS (
        |  SELECT stream_name, max(idx) + 1 AS tgt_next FROM env
        |  WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY stream_name),
        |incoming AS (
        |  SELECT stream_name, min(idx) AS i, max(idx) + 1 AS n FROM env
        |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' GROUP BY stream_name)
        |SELECT incoming.stream_name AS stream_name, i, n,
        |       coalesce(tgt_next, 0) AS tgt_next,
        |       CASE WHEN coalesce(tgt_next, 0) < i THEN 'PrefixMissing'
        |            WHEN coalesce(tgt_next, 0) >= n THEN 'Duplicate'
        |            WHEN coalesce(tgt_next, 0) > i THEN 'PartialDuplicate'
        |            ELSE 'Ok' END AS outcome
        |FROM incoming LEFT JOIN target ON incoming.stream_name = target.stream_name
        |ORDER BY stream_name""".stripMargin) { (spark, dir) =>
    val e = env(spark, dir)
    val cut15 = lit("2024-01-15 00:00:00").cast(TimestampType)
    val cut10 = lit("2024-01-10 00:00:00").cast(TimestampType)
    val target = e.where(col("ts") < cut15).groupBy(col("stream_name"))
      .agg((max(col("idx")) + 1).as("tgt_next"))
    val incoming = e.where(col("ts") >= cut10).groupBy(col("stream_name"))
      .agg(min(col("idx")).as("i"), (max(col("idx")) + 1).as("n"))
    val next = coalesce(col("tgt_next"), lit(0L))
    incoming.join(target, Seq("stream_name"), "left")
      .select(col("stream_name"), col("i"), col("n"), next.as("tgt_next"),
        when(next < col("i"), "PrefixMissing")
          .when(next >= col("n"), "Duplicate")
          .when(next > col("i"), "PartialDuplicate")
          .otherwise("Ok").as("outcome"))
      .orderBy(col("stream_name"))
  }

  // Q8: pruning — delete all events ≤ k per stream; verification counts
  // (CosmosStorePruner.fs:16-84). k = write_pos midpoint.
  val q08Prune: QueryDef = QueryDef(
    "q08_prune",
    envSql +
      """,
        |k AS (SELECT stream_name, CAST(floor((max(idx) + 1) / 2) AS BIGINT) AS prune_to
        |      FROM env GROUP BY stream_name)
        |SELECT env.stream_name AS stream_name,
        |       count(CASE WHEN idx <= prune_to THEN 1 END) AS pruned,
        |       count(CASE WHEN idx > prune_to THEN 1 END) AS retained,
        |       any_value(prune_to) AS prune_to
        |FROM env JOIN k ON env.stream_name = k.stream_name
        |GROUP BY env.stream_name
        |ORDER BY stream_name""".stripMargin) { (spark, dir) =>
    val e = env(spark, dir)
    val k = e.groupBy(col("stream_name"))
      .agg(floor((max(col("idx")) + 1) / 2).cast(LongType).as("prune_to"))
    e.join(k, Seq("stream_name"))
      .groupBy(col("stream_name"))
      .agg(
        count(when(col("idx") <= col("prune_to"), 1)).as("pruned"),
        count(when(col("idx") > col("prune_to"), 1)).as("retained"),
        first(col("prune_to")).as("prune_to"))
      .orderBy(col("stream_name"))
  }

  // Q9: exactly-once epoch ingestion — trim the overlap of an incoming
  // span set against what an epoch already holds (AppendsEpoch.fs:76-137):
  // per stream, keep only idx >= recorded next; classify the decision.
  val q09EpochIngest: QueryDef = QueryDef(
    "q09_epoch_ingest",
    envSql +
      """,
        |epoch AS (
        |  SELECT stream_name, max(idx) + 1 AS cur_next FROM env
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00' GROUP BY stream_name),
        |req AS (
        |  SELECT stream_name, min(idx) AS req_i, max(idx) + 1 AS req_n,
        |         count(*) AS req_len
        |  FROM env WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' GROUP BY stream_name)
        |SELECT req.stream_name AS stream_name,
        |       CASE WHEN cur_next IS NULL THEN 'Start'
        |            WHEN req_n <= cur_next THEN 'Discard'
        |            WHEN req_i > cur_next THEN 'Gap'
        |            ELSE 'Append' END AS decision,
        |       CASE WHEN cur_next IS NULL THEN req_len
        |            WHEN req_n <= cur_next THEN 0
        |            WHEN req_i > cur_next THEN 0
        |            ELSE req_n - cur_next END AS appended
        |FROM req LEFT JOIN epoch ON req.stream_name = epoch.stream_name
        |ORDER BY stream_name""".stripMargin) { (spark, dir) =>
    val e = env(spark, dir)
    val epoch = e.where(col("ts") < lit("2024-01-20 00:00:00").cast(TimestampType))
      .groupBy(col("stream_name")).agg((max(col("idx")) + 1).as("cur_next"))
    val req = e.where(col("ts") >= lit("2024-01-05 00:00:00").cast(TimestampType))
      .groupBy(col("stream_name"))
      .agg(min(col("idx")).as("req_i"), (max(col("idx")) + 1).as("req_n"),
        count(lit(1)).as("req_len"))
    req.join(epoch, Seq("stream_name"), "left")
      .select(col("stream_name"),
        when(col("cur_next").isNull, "Start")
          .when(col("req_n") <= col("cur_next"), "Discard")
          .when(col("req_i") > col("cur_next"), "Gap")
          .otherwise("Append").as("decision"),
        when(col("cur_next").isNull, col("req_len"))
          .when(col("req_n") <= col("cur_next"), 0L)
          .when(col("req_i") > col("cur_next"), 0L)
          .otherwise(col("req_n") - col("cur_next")).as("appended"))
      .orderBy(col("stream_name"))
  }

  // Q21: two-phase index+hydrate source (DynamoStoreSource.fs:43-144,
  // EventLoadMode 115-144): build the span-summary index from the
  // envelope, synthesize the envelope back from the index alone
  // (IndexOnly), hydrate bodies by (stream, idx) join (WithData). The
  // round-trip must reproduce the envelope exactly — any index
  // mis-summarization, position arithmetic or hydration key error
  // breaks the hash.
  val q21IndexHydrate: QueryDef = QueryDef(
    "q21_index_hydrate",
    envSql +
      """
        |SELECT stream_name, idx, event_type, props AS data
        |FROM env
        |ORDER BY stream_name, idx""".stripMargin) { (spark, dir) =>
    val envelope = env(spark, dir)
      .select(col("stream_name"), col("idx"), col("event_type"),
        col("props").as("data"))
    val index = graft.sources.IndexHydrate.buildIndex(envelope)
    graft.sources.IndexHydrate.hydrate(index, envelope, Seq("data"))
      .select(col("stream_name"), col("idx"), col("event_type"), col("data"))
      .orderBy(col("stream_name"), col("idx"))
  }

  val all: Seq[QueryDef] = Seq(
    q01ScanFilter, q01ScanFilterRe, q02Categorize, q03DedupeWritePos, q04GapsIslands,
    q05UnfoldRetention, q06StreamHwm, q07AppendOutcome, q08Prune, q09EpochIngest,
    q21IndexHydrate)
}
