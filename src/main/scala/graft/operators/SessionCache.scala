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

/** A/B instrument for session-resident localCheckpoint caches (the
  * round-14 adjudication method, SCALING.md follow-up 1): the env knob
  * `SPARK_GRAFT_NO_CACHE` names residence CLASSES (comma-separated:
  * `band`, `simhash`, `modality`, `termfreq`) whose frames are then
  * returned LAZY — consumers recompute per action instead of reading
  * resident block-manager blocks. Correctness is identical either way
  * (the frames are deterministic); the knob exists so one binary can
  * run the suite with a cache class resident vs excluded on ONE quiet
  * boot and measure what the residency costs the 140+ NON-consumer
  * queries (storage-pool + GC pressure is invisible to per-query plan
  * audits — it taxed the whole round-13 suite 1.23×). */
private[operators] object CacheResidence {
  private val excluded: Set[String] = sys.env.get("SPARK_GRAFT_NO_CACHE")
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  /** `df.localCheckpoint()` unless the residence class is excluded. */
  def resident(cls: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (excluded(cls)) df else df.localCheckpoint()
}
