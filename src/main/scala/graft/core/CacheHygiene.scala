package graft.core

import org.apache.spark.sql.SparkSession

/** Release the cache behind abandoned `localCheckpoint`s.
  *
  * Spark's `Dataset.localCheckpoint` persists an INTERNAL RDD it never
  * exposes, so an iterative operator that re-checkpoints per round
  * (BPE merge training, connected-component contraction) accumulates
  * one dead cached copy per round — and across bench reps the leak
  * compounds. The only public handle is the persistent-RDD registry:
  * diff its id set around the checkpoint call, then unpersist the
  * dead ids once the NEXT round's checkpoint is materialized.
  *
  * Never unpersist ids a still-live DataFrame depends on: a local
  * checkpoint's lineage is truncated, so its blocks cannot be
  * recomputed — unpersisting one that is still referenced fails the
  * next job over it instead of slowing it down.
  */
object CacheHygiene {

  /** Run `make` (expected to materialize at least one localCheckpoint
    * eagerly) and return its result plus the ids of RDDs it newly
    * persisted. The id snapshot is taken immediately around the call,
    * so a concurrent session's persists can only leak in during the
    * call itself — and Bench/Verify run queries sequentially.
    */
  def withNewPersisted[T](spark: SparkSession)(make: => T): (T, Set[Int]) = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = make
    (out, (spark.sparkContext.getPersistentRDDs.keySet -- before).toSet)
  }

  /** Unpersist the given registry ids (non-blocking); ids already
    * evicted are skipped. */
  def unpersist(spark: SparkSession, ids: Set[Int]): Unit = {
    val reg = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
  }
}
