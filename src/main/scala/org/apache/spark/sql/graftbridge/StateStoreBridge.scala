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
}
