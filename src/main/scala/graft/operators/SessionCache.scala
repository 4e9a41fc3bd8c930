package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for values bound to a SparkSession lifecycle
  * (eagerly-checkpointed plans, materialized table paths): entries are
  * evicted by a SparkListener the moment the owning context ends,
  * rather than by an O(entries) sweep on every access — a stopped
  * session's checkpoint blocks and plan objects are never pinned until
  * the next unrelated call. Keys use the session REFERENCE
  * (SparkSession doesn't override equals, so two live sessions can
  * never alias).
  */
final class SessionCache[K, V] {

  // The map holds lazy holders, not values: putIfAbsent wins the slot
  // cheaply and the (possibly multi-second Spark job) build then runs
  // under the HOLDER's own lock, not the ConcurrentHashMap bin lock.
  // computeIfAbsent(build) would pin the bin for the build's duration —
  // unrelated keys hashing to the same bin would block behind a full
  // localCheckpoint, and a reentrant getOrElseUpdate (a build that
  // itself consults the cache) would throw IllegalStateException.
  private final class Holder(thunk: () => V) { lazy val value: V = thunk() }

  private val map =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), Holder]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    // a stopped session gets its value built uncached: the listener
    // could never fire for it, so an inserted entry would leak
    if (spark.sparkContext.isStopped) return build
    if (hooked.add(spark)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          map.entrySet.removeIf(e => e.getKey._1 eq spark)
          hooked.remove(spark)
        }
      })
    }
    val mine = new Holder(() => build)
    val prior = map.putIfAbsent((spark, key), mine)
    val holder = if (prior == null) mine else prior
    val v = holder.value
    // close the insert/stop race: if the context stopped after the
    // isStopped check above, the sweep listener may have already run
    // and missed our entry — remove it ourselves (idempotent)
    if (spark.sparkContext.isStopped) map.remove((spark, key), holder)
    v
  }

  private[operators] def size: Int = map.size
}

/** A/B + bench-policy instrument for the session-scoped derivation
  * caches. Two orthogonal knobs:
  *
  *  - `SPARK_GRAFT_NO_CACHE` (the round-14 residency instrument,
  *    SCALING.md follow-up 1) names residence CLASSES whose frames are
  *    returned LAZY — consumers recompute per action instead of
  *    reading resident block-manager blocks, but the session MEMO
  *    (one plan object / one build thunk per session) stays. It
  *    measures what block residency costs the non-consumer queries
  *    (storage-pool + GC pressure taxed the round-13 suite 1.23×).
  *
  *  - `SPARK_GRAFT_NO_MEMO` (optimization round 20, VERDICT r19
  *    follow-up 1) names classes whose session memo is BYPASSED
  *    entirely: every call re-derives the artifact — driver collects,
  *    trainer jobs, checkpoints and all — so a timed execution pays
  *    the full per-execution cost of the pipeline the query declares.
  *    `all` = every class. [[graft.Bench]] flips the same switch
  *    programmatically ([[setNoMemo]]) to time a second,
  *    per-execution pass next to the steady-state pass, and the
  *    oracle gate can run under `SPARK_GRAFT_NO_MEMO=all` to prove
  *    the bypass path computes identical results.
  *
  * Residence classes (every SessionCache derivation site carries one):
  * `band` (minhash signatures + band index), `lshcand` (distinct LSH
  * candidate pairs), `containcand` / `fuzzycand` (containment /
  * fuzzy-contam candidate pairs), `simhash` (signatures + hamming
  * pairs), `cc` (connected-component node map + clusters), `modality`
  * (image/video/audio signature frames), `termfreq` (doc-term
  * frequencies), `dtf` (hashed doc-term buckets), `tokenizer` (BPE
  * merges, wordpiece/unigram vocabs), `centroid` (codebook arrays +
  * centroid frames). NOT classed — and deliberately so — are the
  * fingerprinted PARQUET materializations (wideRead copies,
  * docShingles, hllShingles, dppEvents, bucket tables): those are
  * on-disk ingest-layout artifacts built once per fixture fingerprint,
  * forced untimed in the bench preamble and reported separately as
  * copy_build_secs. */
private[graft] object CacheResidence {
  /** Every bypassable derivation class (the `all` expansion). */
  val DerivationClasses: Set[String] = Set(
    "band", "lshcand", "containcand", "fuzzycand", "simhash", "cc",
    "modality", "termfreq", "dtf", "tokenizer", "centroid")

  private def parse(name: String): Set[String] = sys.env.get(name)
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  private val excluded: Set[String] = parse("SPARK_GRAFT_NO_CACHE")
  private val noMemoEnv: Set[String] = parse("SPARK_GRAFT_NO_MEMO")
  @volatile private var noMemoDyn: Set[String] = Set.empty

  /** Programmatic equivalent of SPARK_GRAFT_NO_MEMO (Bench's
    * per-execution pass); pass Set("all") / Set.empty to flip. */
  private[graft] def setNoMemo(classes: Set[String]): Unit = noMemoDyn = classes

  /** Is this class's session memo bypassed (per-execution mode)? */
  def bypassed(cls: String): Boolean = {
    val d = noMemoDyn
    noMemoEnv("all") || noMemoEnv(cls) || d("all") || d(cls)
  }

  /** `df.localCheckpoint()` unless the residence class is excluded or
    * bypassed (a bypassed class must not leak one checkpoint per
    * execution into the block manager). */
  def resident(cls: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (excluded(cls) || bypassed(cls)) df else df.localCheckpoint()

  /** Session memo unless the class is bypassed: the single guard every
    * derivation-cache call site routes through, so SPARK_GRAFT_NO_MEMO
    * covers EVERY site by construction. */
  def memo[K, V](cls: String, cache: SessionCache[K, V],
      spark: SparkSession, key: K)(build: => V): V =
    if (bypassed(cls)) build else cache.getOrElseUpdate(spark, key)(build)
}
