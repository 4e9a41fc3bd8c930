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

  private val map =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]()
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
    map.computeIfAbsent((spark, key), _ => build)
  }

  private[operators] def size: Int = map.size
}
