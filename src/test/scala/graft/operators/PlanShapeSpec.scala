package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards for the load-bearing queries: the scale
  * properties the engine's perf work established (broadcast strategy,
  * exchange elision, codegen kernels, top-k short-circuit) must not
  * silently regress when query code changes. */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-planshape-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q11_join: both dims broadcast; the fact side never sort-merge-joins") {
    val p = plan("q11_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q18_dedup_embed: one hash pair join with the codegen dot kernel") {
    // The label-block pair join carries no broadcast hint (the block key
    // shuffle-joins at any corpus size); at this SF the planner picks
    // broadcast from size estimates, but the guard only pins hash-join +
    // the integer dot kernel, not the exchange strategy.
    val p = plan("q18_dedup_embed")
    assert(("BroadcastHashJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size) >= 1, p.take(2000))
    assert(p.contains("dot_long"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q13_topk: LIMIT-aware top-k, no global sort") {
    val p = plan("q13_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q03/q04/q05/q17: stream windows reuse the envelope's single exchange") {
    // one exchange for the envelope window, one for the final groupBy,
    // one for the output ordering (q04's count-distinct agg adds one
    // more) — anything beyond means a window re-shuffled on the derived
    // stream_name again
    for ((q, cap) <- Seq("q03_dedupe_writepos" -> 3, "q04_gaps_islands" -> 4,
        "q05_unfold_retention" -> 3)) {
      val n = "Exchange".r.findAllIn(plan(q)).size
      assert(n <= cap, s"$q has $n exchanges")
    }
    // q17 emits window results directly: envelope exchange + output sort
    val n17 = "Exchange".r.findAllIn(plan("q17_stateful")).size
    assert(n17 <= 2, s"q17_stateful has $n17 exchanges")
  }

  test("q18_rebalance: hash-filter sampling — broadcast rates, no window, no sort-merge") {
    // the keep decision must stay embarrassingly parallel: per-lang
    // counts and the global target ride broadcasts; a Window or
    // SortMergeJoin here means someone reintroduced a per-language
    // rank (one reducer per language at corpus scale)
    val p = plan("q18_rebalance")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("SortMergeJoin"))
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q18_pack: sharded running sum — data window keys on (source, shard), offsets broadcast") {
    // concat-then-chop packing must NOT sort a whole source in one
    // task: the data-side cumulative sum partitions on
    // (source, _shard = doc_id div K); only the tiny shard-summary
    // prefix window partitions on source alone, and the offsets reach
    // the data through a broadcast join
    val p = plan("q18_pack")
    assert("windowspecdefinition\\(source#\\d+, _shard#\\d+L?, doc_id".r
      .findAllIn(p).nonEmpty, p.take(3000))
    assert("BroadcastExchange".r.findAllIn(p).size >= 1, p.take(3000))
    assert(!p.contains("SortMergeJoin"))
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 4, s"q18_pack has $n hash exchanges")
  }

  test("q16_late_drop: watermark prefix-max is bucketed, no full-data global sort") {
    // the data-side running max partitions on _b (event_id div K); the
    // per-bucket maxima (K× smaller) go through prefixMaxOfPrevious
    // (partitioned window + theta-join) and reach the data via broadcast
    val p = plan("q16_late_drop")
    assert("windowspecdefinition\\(_b#\\d+L?, event_id".r.findAllIn(p).nonEmpty,
      p.take(3000))
    assert("BroadcastExchange".r.findAllIn(p).size >= 1, p.take(3000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("no unpartitioned window anywhere in the query surface") {
    // THE single-task-stage sweep: an empty-partitionSpec Window sorts
    // the whole input in one task — the classic 100 TB scale-killer.
    // Every running total / rank in the engine must ride a partitioned
    // window (sharded prefix operators for inherently-global prefixes)
    // or a TakeOrdered limit. Checked on the OPTIMIZED logical plan of
    // all registered queries so a regression in any helper is caught
    // regardless of which query exercises it.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bad.isEmpty) Nil
        else List(s"$name: ${bad.head.windowExpressions.take(2).mkString(", ").take(120)}")
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows in: ${offenders.mkString("; ")}")
  }

  test("q18_repetition: both per-doc windows share one doc_id exchange") {
    // argmax row_number and the unordered totals partition on the same
    // key — a second hashpartitioning(doc_id) means the window specs
    // diverged
    val p = plan("q18_repetition")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 2, s"q18_repetition has $n hash exchanges: ${p.take(2000)}")
  }

  test("q18_domain_mix: hash-filter sampling — broadcast rates, no window") {
    // same scale contract as q18_rebalance: the α=0.5 keep decision is
    // a per-row integer test against broadcast counts
    val p = plan("q18_domain_mix")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("SortMergeJoin"))
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q10_analytics/q10_rolling: all frames ride one partition exchange") {
    // every analytic function shares PARTITION BY + ORDER BY, so Spark
    // must evaluate them in one window pass over one hash exchange
    for (q <- Seq("q10_analytics", "q10_rolling")) {
      val p = plan(q)
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n == 1, s"$q has $n hash exchanges: ${p.take(2000)}")
    }
  }

  test("q12_stats: power sums partial-aggregate map-side, one shuffle") {
    val p = plan("q12_stats")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 1, s"q12_stats has $n hash exchanges: ${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size == 2, p.take(2000))
  }

  test("q18_line_dedup: chunk explode is a Generate; two hash shuffles") {
    // first-occurrence = one shuffle on md5(chunk), re-compose = one
    // shuffle on doc_id; the explode itself must stay shuffle-free
    val p = plan("q18_line_dedup")
    assert(p.contains("Generate"), p.take(2000))
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 2, s"q18_line_dedup has $n hash exchanges: ${p.take(2000)}")
  }

  test("q20_dpp: fact scan carries a dynamicpruning partition filter") {
    // the dim filter is only knowable at runtime, so partition pruning
    // on the fact side MUST come from a DPP subquery, not a static
    // predicate — its absence means the join re-scans every partition
    val p = plan("q20_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(3000))
  }

  test("q20_bucket_join: co-located SMJ — the only hash exchange is the agg's") {
    // both sides are bucketed on the join key, so the join itself must
    // read matching bucket files with NO exchange; one shuffle remains
    // for the per-priority aggregation
    val p = plan("q20_bucket_join")
    assert(p.contains("SortMergeJoin"), p.take(2000))
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 1, s"q20_bucket_join has $n hash exchanges: ${p.take(3000)}")
  }

  test("q18_dsir: bucket-delta model rides a broadcast; top-k short-circuits") {
    // the ≤256-row delta table must broadcast into the tf join and the
    // final selection must be TakeOrdered (no global sort of the pool)
    val p = plan("q18_dsir")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q18_ann_ivfpq: per-row encode + codes-only ADC, no sort-merge join") {
    // the corpus-side PQ encode must be the fused per-row codebook map
    // (nearest_codes — NOT an n·K crossJoin + argmin agg); the ADC
    // scoring join rides broadcasts (routed probes + per-probe lookup
    // table are tiny by construction); the exact re-rank touches the
    // integer dot kernel; nothing sort-merges
    val p = plan("q18_ann_ivfpq")
    assert(p.contains("nearest_codes"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
    assert(p.contains("dot_long"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("q18_substring_dedup: all-hash aggregation, no corpus sort before the rollup") {
    // first-occurrence detection must stay in HASH aggregates (the
    // all-long min_by buffers) — a min(struct) formulation falls to
    // SortAggregate and sorts every token in the corpus; the only
    // Sorts allowed are the per-doc window sort (partitioned by
    // doc_id) and the final ORDER BY of the ≤|docs| rollup
    val p = plan("q18_substring_dedup")
    assert(!p.contains("SortAggregate"),
      s"substring dedup fell to SortAggregate: ${p.take(3000)}")
    assert(p.contains("Generate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q18_kmeans: assignment is a pure per-row map against the driver codebook") {
    // the codebook rides the task binary (NearestCodes reference
    // object), so the assignment path has NO join and NO aggregation —
    // n rows in, n out; a Join or HashAggregate here would mean the
    // n·K cross product came back
    val p = plan("q18_kmeans")
    assert(p.contains("nearest_codes"), p.take(2000))
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("HashAggregate"), p.take(3000))
  }
}
