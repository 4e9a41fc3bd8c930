package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** One document entering the packing gate. */
final case class PackInput(source: String, docId: Long, nWords: Long)

/** The gate's assignment: which fixed-size context window holds the
  * document's first token. */
final case class PackedDoc(source: String, doc_id: Long, n_words: Long, chunk_id: Long)

/** Per-source packing cursor: highest doc id admitted + running token
  * count. O(1) per source — the gate never holds per-doc history. */
final case class PackState(lastDocId: Long, cumTokens: Long)

/** Streaming sequence packing: assigns each arriving document its
  * concat-then-chop chunk id incrementally — the stream-side twin of
  * the batch q18_pack operator (chunk = tokens-before-doc div budget),
  * for ingest pipelines that pack as data lands instead of re-running
  * a corpus-wide prefix sum.
  *
  * Packing is order-dependent by definition, so the gate requires
  * per-source doc_id-ordered delivery ACROSS micro-batches (the
  * ordered-ingest contract a feed source provides) and sorts within
  * each batch. Redeliveries — doc_id at or below the admitted
  * cursor — are dropped, never re-packed: the cursor state makes the
  * emitted assignment exactly-once, and an already-emitted assignment
  * can never change (state is the (cursor, cumTokens) pair, not
  * history). PackStreamSpec pins chunk ids identical to the batch
  * operator across batch splits and under redelivery.
  *
  * A genuinely NEW document arriving below the cursor (an
  * ordered-ingest contract violation) is indistinguishable from a
  * redelivery and is dropped like one — but never silently: every drop
  * increments the [[dropCounter]] accumulator, so a violation shows as
  * a counter climbing past the known redelivery volume (a clean
  * exactly-once resend is also counted — the signal is the RATE vs the
  * source's redelivery profile, and any nonzero count on a
  * no-redelivery source is a contract violation by definition).
  */
object PackStream {

  /** Name under which [[process]] registers its drop accumulator (shows
    * in the Spark UI / StatusStore per stage). */
  val DropCounterName = "graft.pack.droppedBelowCursor"

  private val counters = new graft.operators.SessionCache[String, LongAccumulator]

  /** Session-scoped accumulator counting docs dropped at the cursor
    * (redeliveries + any ordering-contract violations). Memoized per
    * SparkSession: a monitor reading the counter and the stream wiring
    * feeding it both resolve to the SAME accumulator, so observed
    * counts are shared — not independent per-call zeros. */
  def dropCounter(spark: org.apache.spark.sql.SparkSession): LongAccumulator =
    counters.getOrElseUpdate(spark, DropCounterName) {
      spark.sparkContext.longAccumulator(DropCounterName)
    }

  def process(in: Dataset[PackInput], budget: Long = 512L,
      dropped: Option[LongAccumulator] = None): Dataset[PackedDoc] = {
    implicit val stateEnc = Encoders.product[PackState]
    implicit val outEnc = Encoders.product[PackedDoc]
    import in.sparkSession.implicits._
    in.groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (src, it, state) =>
        val prev = state.getOption.getOrElse(PackState(-1L, 0L))
        var cum = prev.cumTokens
        var last = prev.lastDocId
        val out = it.toVector.sortBy(_.docId).flatMap { d =>
          if (d.docId <= last) { // redelivery OR ordering violation
            dropped.foreach(_.add(1L))
            None
          } else {
            val chunk = cum / budget
            cum += d.nWords
            last = d.docId
            Some(PackedDoc(src, d.docId, d.nWords, chunk))
          }
        }
        state.update(PackState(last, cum))
        out.iterator
      }
  }
}
