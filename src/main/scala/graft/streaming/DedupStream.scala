package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document entering the ingestion stream. */
final case class DocIn(docId: Long, text: String)

/** A document admitted to the corpus (first occurrence of its content). */
final case class KeptDoc(contentHash: String, docId: Long)

/** Incremental exact dedup for a training-corpus ingestion stream:
  * first-seen-wins on md5(text), the streaming form of the batch
  * q18_dedup_exact operator (reference: the ingestion-side dedupe the
  * engine's write-position logic performs per stream — here per
  * CONTENT, the LLM-pipeline variant; SURVEY §2.12 Q18).
  *
  * `groupByKey(contentHash) + flatMapGroupsWithState` keeps exactly one
  * state row per distinct document ever admitted: the winning docId.
  * A batch's rows for an unseen hash admit the smallest docId in that
  * batch (deterministic within the micro-batch); every later
  * redelivery or near-copy with identical bytes finds the state row
  * and emits nothing. Scale: state is keyed by a 16-byte digest —
  * RocksDB-backed on a cluster, hash-partitioned on contentHash, so
  * the corpus-wide seen-set shards across executors and the only
  * shuffle is the one exchange on the digest. Unbounded retention is
  * the point (the corpus is forever); callers that only guard against
  * redelivery storms can bound it with a processing-time TTL the same
  * way StreamProcessor's purgeAfterMs does.
  */
object DedupStream {

  private implicit val stringEnc: Encoder[String] = Encoders.STRING
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val keptEnc: Encoder[KeptDoc] = Encoders.product[KeptDoc]
  private implicit val hashedEnc: Encoder[(String, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

  def firstSeen(docs: Dataset[DocIn]): Dataset[KeptDoc] = {
    docs
      .select(md5(col("text").cast("binary")).as("contentHash"), col("docId"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, KeptDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (hash: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keep = rows.map(_._2).min
            state.update(keep)
            Iterator.single(KeptDoc(hash, keep))
          }
      }
  }
}
