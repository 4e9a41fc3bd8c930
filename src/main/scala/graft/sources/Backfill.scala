package graft.sources

import java.util.concurrent.{ConcurrentHashMap, Executors}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.concurrent.{ExecutionContext, Future}
import scala.util.{Failure, Success}

/** Striped catch-up backfill: read a large historical range as K
  * parallel chunk jobs, but release results to the sink strictly in
  * chunk order — the reference's chunk-parallel reader + series-ordered
  * release (EventStoreReader.fs:94-338 + StripedIngester.fs:47-144).
  *
  * On Spark the "stripes" are range-pruned scans (predicate pushdown
  * makes each chunk read only its slice); reads overlap as concurrent
  * Spark jobs bounded by `maxDop` (the read-ahead gate), while
  * `deliver` observes chunks 0,1,2,… gap-free: a chunk completing early
  * waits in the ready set until its predecessors have been delivered.
  * The backfill-then-tail pattern: run this to the recorded tail
  * position, then start the streaming source from that offset.
  */
object Backfill {

  /** Ordered driver-side delivery is the POINT of this operator (the
    * sink callback observes chunks strictly in order), which also makes
    * it a control path, not a data path: every chunk is collect()ed to
    * the driver, so size chunks to what one driver heap comfortably
    * holds (and keep bulk movement in distributed writes). At scale the
    * pattern is stripes of bounded chunks, not one stripe over the
    * whole table.
    *
    * @param chunkOf   chunk index expression (e.g. `col("idx") div 1000`)
    * @param numChunks total chunks covering the range
    * @param deliver   called once per chunk, in ascending chunk order
    * @param maxDop    concurrent chunk reads (read-ahead bound)
    */
  def stripedBackfill(
      df: DataFrame,
      chunkOf: Column,
      numChunks: Int,
      deliver: (Int, Array[Row]) => Unit,
      maxDop: Int = 4): Unit = {
    val pool = Executors.newFixedThreadPool(maxDop)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val chunked = df.withColumn("__chunk", chunkOf)
    val ready = new ConcurrentHashMap[Int, Array[Row]]
    val lock = new Object
    @volatile var failure: Option[Throwable] = None
    try {
      (0 until numChunks).foreach { c =>
        Future(chunked.where(col("__chunk") === c).drop("__chunk").collect())
          .onComplete { res =>
            lock.synchronized {
              res match {
                case Success(rows) => ready.put(c, rows)
                case Failure(e) => failure = failure.orElse(Some(e))
              }
              lock.notifyAll()
            }
          }
      }
      var next = 0
      lock.synchronized {
        while (next < numChunks && failure.isEmpty) {
          if (ready.containsKey(next)) {
            deliver(next, ready.remove(next))
            next += 1
          } else lock.wait()
        }
      }
      failure.foreach(throw _)
    } finally pool.shutdown()
  }
}
