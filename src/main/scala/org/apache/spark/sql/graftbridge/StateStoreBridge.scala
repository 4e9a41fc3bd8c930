package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge for [[StateStore.unloadAll]], which is `private[sql]`: the
  * recovery half of the StreamBench frontier measurement needs to
  * force-unload every loaded state-store provider between the ingest
  * run and the restart, so the restarted query reloads state from the
  * checkpoint FS (snapshot download + changelog replay) exactly as a
  * post-failure executor would, instead of reusing the warm in-process
  * RocksDB/HDFS-store instances.
  */
object StateStoreBridge {
  def unloadAll(): Unit = StateStore.unloadAll()

  /** Pause/resume the background maintenance thread (snapshot uploads,
    * file cleanup). The recovery rig's one un-modeled residual (r18
    * formula_check: GET-bound aggressive-cadence cells sit ~2 s above
    * every model, restart opens 273 vs 623 at identical knobs) is the
    * maintenance thread racing the TIMED restart window — a snapshot
    * upload scheduled mid-measurement adds throttled round-trips that
    * have nothing to do with the recovery path under study. Pausing
    * during the timed window measures the clean floor; production
    * restarts DO race maintenance, so the rig records which mode a
    * cell ran in and the race term is reported, not hidden.
    */
  def setMaintenancePaused(paused: Boolean): Unit =
    StateStore.setMaintenancePaused(paused)
}
