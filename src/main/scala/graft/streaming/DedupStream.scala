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

/** A 10-word chunk of one document flowing through the ingestion
  * stream (position `ci` within `docId`). */
final case class ChunkIn(docId: Long, ci: Int, chunk: String)

/** A chunk admitted to the corpus: the first occurrence of its
  * content, at (docId, ci). */
final case class KeptChunk(chunkHash: String, docId: Long, ci: Int)

/** Incremental CCNet-style line dedup: the streaming form of the batch
  * q18_line_dedup operator. Chunks stream in, and only the FIRST
  * occurrence of each distinct chunk corpus-wide survives — repeated
  * boilerplate arriving weeks later is dropped against the full
  * history, which lives sharded in the state store keyed by the chunk
  * digest (RocksDB-backed on a cluster; the only shuffle is the one
  * exchange on the digest, identical to [[DedupStream]]). Within a
  * micro-batch the (docId, ci) minimum wins, so admission is
  * deterministic under any partitioning; when batches arrive in
  * document order the admitted set is EXACTLY the batch operator's
  * keep set (ChunkStreamSpec pins this parity plus redelivery
  * no-ops). Downstream, a consumer re-composes each document from its
  * kept positions — the same re-compose the batch operator performs.
  */
object LineDedupStream {

  private implicit val keptEnc: Encoder[KeptChunk] = Encoders.product[KeptChunk]
  private implicit val stringEnc: Encoder[String] = Encoders.STRING

  /** Segment whole documents into the stream's chunk rows (the same
    * 10-word segmentation as the batch operator). */
  def chunksOf(docs: Dataset[DocIn]): Dataset[ChunkIn] = {
    implicit val enc: Encoder[ChunkIn] = Encoders.product[ChunkIn]
    docs.flatMap { d =>
      // split with limit -1: keep trailing empty tokens, exactly like
      // the batch operator's Spark SQL split — Scala's 1-arg split
      // drops them, which would silently break streaming/batch parity
      // on trailing-delimiter text
      d.text.split(" ", -1).grouped(10).zipWithIndex.map { case (ws, i) =>
        ChunkIn(d.docId, i, ws.mkString(" "))
      }
    }
  }

  def firstSeen(chunks: Dataset[ChunkIn]): Dataset[KeptChunk] = {
    implicit val stateEnc: Encoder[(Long, Int)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)
    chunks
      .select(md5(col("chunk").cast("binary")).as("chunkHash"),
        col("docId"), col("ci"))
      .as[(String, Long, Int)](Encoders.tuple(
        Encoders.STRING, Encoders.scalaLong, Encoders.scalaInt))
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Int), KeptChunk](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (hash: String, rows: Iterator[(String, Long, Int)],
         state: GroupState[(Long, Int)]) =>
          if (state.exists) Iterator.empty
          else {
            val (docId, ci) = rows.map(r => (r._2, r._3)).min
            state.update((docId, ci))
            Iterator.single(KeptChunk(hash, docId, ci))
          }
      }
  }
}
