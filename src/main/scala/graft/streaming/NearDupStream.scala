package graft.streaming

import graft.operators.SimilarityQueries
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental NEAR-dup filtering for a training-corpus ingestion
  * stream: each micro-batch's documents are minhash-banded (the same
  * 8-hash/4-band LSH pipeline as the batch q18 operators) and dropped
  * if any band bucket collides with the ever-growing persisted bucket
  * index — the streaming form of minhash-LSH dedup, where the "seen"
  * side is the whole corpus ingested so far.
  *
  * Shape: `foreachBatch` + a parquet-backed bucket index, because the
  * seen-set must outlive the query (a training corpus is ingested over
  * weeks by many runs) and the per-batch work is a plain batch join —
  * bucket-keyed, so at 100 TB it shuffles the (tiny) batch side
  * against the bucket-partitioned index and never compares documents
  * pairwise. In-batch ties resolve pessimistically and
  * deterministically: a doc also drops if any of its buckets holds a
  * smaller doc_id in the same batch (bucket-min survives; chains that
  * need transitive resolution are the batch CC operator's job).
  *
  * Exactly-once: a marker file per batchId makes redelivered batches
  * no-ops after restart (the same latest-wins idea as
  * CheckpointStore); the index and kept appends land before the
  * marker, so a crash mid-batch redoes the batch idempotently for the
  * kept set (appends keyed by batch subdir are overwritten, not
  * doubled). A production deployment would swap the two parquet
  * appends for one transactional-table commit; the protocol here is
  * the same one AppendSink uses for idempotent appends.
  */
object NearDupStream {

  private[graft] def bucketIndex(docs: DataFrame): DataFrame =
    SimilarityQueries.bandBuckets(docs).select(col("doc_id"), col("band"), col("bucket"))

  // all marker/lease/listing I/O goes through the Hadoop FileSystem of
  // the index dir itself (the round-14 CheckpointStore/AnnIndexStore
  // discipline): the protocol works unchanged when the index lives on
  // hdfs:// instead of silently writing markers to the local disk
  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readIndex(spark: SparkSession, indexDir: String,
      excludeBatchId: Long): DataFrame = {
    val (fs, root) = fsFor(spark, indexDir)
    val hasBatches = fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("batch="))
    if (hasBatches)
      // exclude the current batch's partition: a crash between the
      // index write and the marker must not make the redone batch see
      // its own half-written buckets as "seen" (partition pruning
      // drops the directory at scan planning, no data read)
      spark.read.parquet(indexDir)
        .where(col("batch") =!= lit(excludeBatchId))
        .select(col("band"), col("bucket"))
    else {
      import spark.implicits._
      Seq.empty[(Int, String)].toDF("band", "bucket")
    }
  }

  /** Process one micro-batch under an arbitrary signature function
    * (docs → (doc_id, band, bucket)): the whole drop/persist/marker
    * protocol is signature-agnostic, so modality twins (ImageDupStream)
    * reuse it verbatim with their own bucketing.
    *
    * The gate is a lossy CANDIDATE FILTER, not a candidate generator:
    * a bucket collision drops the doc without the exact confirm the
    * batch operators run (gain-delta for audio, edit/containment for
    * text), so a collision the confirm would REJECT is still dropped.
    * With `quarantineDir` set, every dropped doc lands in
    * `$quarantineDir/batch=N` with its id and a drop reason
    * (`corpus_index` = collided with the persisted index,
    * `batch_min` = lost an in-batch bucket tie), so the batch
    * resolver can re-run the exact confirm over quarantined docs and
    * re-admit false positives — nothing is silently destroyed. The
    * subdir is batch-scoped-overwrite like kept/index, so crash-redo
    * idempotency covers it too.
    *
    * Returns the KEPT frame (the admitted payload rows) so a composed
    * consumer (PackStream feed, sync-feed's topic render) reads the
    * verdict it already paid for instead of a per-page parquet
    * read-back of `$keptDir/batch=N` — that synchronous read-back was
    * half the chain's remaining per-page floor (BASELINE.md round 14).
    * The plan is batch-bounded (input rows anti-joined to the
    * checkpointed verdict frame), bit-identical to the persisted
    * subdir; a REDELIVERED batch returns the persisted subdir itself. */
  private[streaming] def processBatchWith(signature: DataFrame => DataFrame,
      payload: Seq[String] = Seq("doc_id", "text"))(
      batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    // fail fast under an active compaction lease: a batch whose index
    // scan was planned before the fold would chase deleted source
    // files mid-job (no data loss either way — the marker protocol
    // redoes the batch — but this turns a confusing mid-job
    // FileNotFound into an immediate, explicit error)
    val (ifs, iroot) = fsFor(spark, indexDir)
    if (ifs.exists(new HPath(iroot, "_compacting")))
      throw new IllegalStateException(
        s"$indexDir is being compacted (lease file $indexDir/_compacting present); " +
          "retry the batch after compactIndex finishes — or, if no compactor is " +
          "running, remove the stale lease left by a crashed compaction")
    val marker = new HPath(iroot, s"_batches/batch-$batchId")
    if (ifs.exists(marker)) // redelivered batch: no-op, serve the persisted verdict
      return spark.read.parquet(s"$keptDir/batch=$batchId")
    // payload head must be doc_id; the rest travels to kept/quarantine
    // (text for the text/modality gates, embedding for the vector gate)
    val docs = batch.select(payload.map(col): _*)
    val bands = signature(docs).localCheckpoint() // one signature pass per batch
    val seen = readIndex(spark, indexDir, batchId)
    // drop if any bucket is in the corpus index, or holds a smaller
    // doc_id within this batch (deterministic under any partitioning);
    // index collisions outrank in-batch ties when both apply — the
    // corpus side is the one the exact confirm must consult
    val inIndex = bands.join(seen, Seq("band", "bucket"), "left_semi")
      .select(col("doc_id")).distinct()
    val batchMin = bands
      .groupBy(col("band"), col("bucket")).agg(min(col("doc_id")).as("min_id"))
    val underMin = bands.join(batchMin, Seq("band", "bucket"))
      .where(col("doc_id") > col("min_id"))
      .select(col("doc_id")).distinct()
    // the per-doc drop verdict, checkpointed ONCE (batch-bounded rows,
    // reclaimed by the ContextCleaner when the batch's plans drop): all
    // three persistence writes below consume it, so the ever-growing
    // corpus-index scan inside inIndex runs once per batch — the
    // round-13 form re-ran it inside each write, 3× per admitted page
    val reasons = inIndex.select(col("doc_id"), lit("corpus_index").as("reason"))
      .unionByName(underMin.join(inIndex, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit("batch_min").as("reason")))
      .localCheckpoint()
    val kept = docs.join(reasons, Seq("doc_id"), "left_anti")
    // batch-scoped subdirs make a redone batch overwrite, not double.
    // The three writes are independent jobs fenced by ONE marker — the
    // marker lands only after ALL complete, so they form one logical
    // transaction per page and can run CONCURRENTLY (wall cost of the
    // slowest write, not the sum; a crash mid-any leaves the batch
    // unmarked and the redo overwrites all three subdirs).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val writes = Seq(
      Future {
        kept.write.mode(SaveMode.Overwrite).parquet(s"$keptDir/batch=$batchId")
      },
      Future {
        quarantineDir.foreach { qd =>
          docs.join(reasons, Seq("doc_id"))
            .select(payload.map(col) :+ col("reason"): _*)
            .write.mode(SaveMode.Overwrite).parquet(s"$qd/batch=$batchId")
        }
      },
      Future {
        bands.join(reasons.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("band"), col("bucket")).distinct()
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/batch=$batchId")
      })
    Await.result(Future.sequence(writes), Duration.Inf)
    ifs.mkdirs(marker.getParent)
    ifs.createNewFile(marker)
    kept
  }

  /** Minhash-LSH batch processing (the original surface). Exposed for
    * direct batch use and tests; `start` wires it into foreachBatch. */
  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): DataFrame =
    processBatchWith(bucketIndex)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** [[processBatch]] with a custom payload column set (head must be
    * doc_id; the rest rides to kept/quarantine) — composed-chain use:
    * a downstream gate (e.g. [[PackStream]]) needs source/n_words
    * carried through the kept set instead of re-deriving them. */
  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String], payload: Seq[String]): DataFrame =
    processBatchWith(bucketIndex, payload)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** Compact the persisted bucket index: a weeks-long ingestion leaves
    * one `batch=N` parquet directory per micro-batch — thousands of
    * tiny partitions whose listing cost alone dominates the per-batch
    * index scan long before 100 TB. This maintenance op folds every
    * COMPLETED batch partition (and any prior consolidated partition)
    * into one fresh `batch=<negative id>` partition of distinct
    * (band, bucket) rows. Works unchanged for every gate on the shared
    * protocol (text/exact/embed/simhash/image/audio/winnow — the index
    * schema is always (band, bucket)).
    *
    * Safety argument, hinging on the marker protocol:
    *  - only MARKED batches are folded: a marked batch can never be
    *    redelivered (processBatchWith short-circuits on the marker),
    *    so folding it can never violate the redo-must-not-see-its-own
    *    -buckets exclusion. An UNMARKED partition (crash between index
    *    write and marker) is left in place for its redo to overwrite.
    *  - the consolidated output goes to a FRESH negative id (micro-
    *    batch ids are ≥ 0, so `batch =!= excludeBatchId` never prunes
    *    it), written BEFORE any source partition is deleted: a crash
    *    mid-write leaves a partial distinct subset next to intact
    *    sources (duplicate (band, bucket) rows are harmless under the
    *    gate's semi-join), and a crash mid-delete leaves a superset —
    *    either way the next compaction folds the debris, because ALL
    *    negative partitions are always sources. Monotone and
    *    idempotent; markers are kept forever (empty files — they are
    *    the redelivery contract, not data).
    *
    * Run it while the gate is quiescent (between ingestion runs, like
    * any out-of-band table compaction). Quiescence is ENFORCED by a
    * `_compacting` lease file held for the duration of the fold:
    * [[processBatchWith]] fails fast while it exists (instead of a
    * batch planned pre-fold chasing deleted source files mid-job),
    * and a second concurrent compactIndex refuses to start. The lease
    * is released on ANY exception; only a JVM death mid-fold leaves a
    * stale lease, which then blocks batches with an explicit
    * remove-the-stale-lease message — fail-fast, never data loss.
    * Returns the number of partitions folded (0 = nothing to do). */
  def compactIndex(spark: SparkSession, indexDir: String): Long = {
    val (fs, root) = fsFor(spark, indexDir)
    if (!fs.exists(root)) return 0L
    val lease = new HPath(root, "_compacting")
    if (fs.exists(lease) || !fs.createNewFile(lease))
      throw new IllegalStateException(
        s"$lease already exists: another compaction is running (or crashed " +
          "mid-fold — verify none is, then remove the lease and rerun)")
    try compactIndexLocked(spark, indexDir, fs, root)
    finally fs.delete(lease, false)
  }

  private def compactIndexLocked(spark: SparkSession,
      indexDir: String, fs: FileSystem, root: HPath): Long = {
    def ls(dir: HPath): Vector[HPath] =
      if (!fs.exists(dir)) Vector.empty
      else fs.listStatus(dir).map(_.getPath).toVector
    val markers: Set[Long] = ls(new HPath(root, "_batches"))
      .flatMap(f => f.getName.stripPrefix("batch-").toLongOption).toSet
    val parts: Vector[(Long, HPath)] = ls(root)
      .filter(_.getName.startsWith("batch="))
      .flatMap(d => d.getName.stripPrefix("batch=").toLongOption.map(_ -> d))
    val sources = parts.filter { case (n, _) => n < 0 || markers(n) }
    if (sources.size <= 1) return 0L
    val outId = math.min(sources.map(_._1).min, 0L) - 1L
    spark.read.parquet(sources.map(_._2.toString): _*)
      .select(col("band"), col("bucket")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/batch=$outId")
    sources.foreach { case (_, d) => fs.delete(d, true) }
    sources.size.toLong
  }

  /** Measured OVER-DROP rate of a lossy modality gate — the stat a
    * pipeline owner sizes the batch re-adjudication pass with. The
    * gate drops on bucket collision WITHOUT the exact confirm the
    * batch operator runs, so some quarantined assets are false
    * positives: in the same bucket as a kept asset, but outside the
    * confirm threshold. This report recomputes the confirm for every
    * quarantined asset against the KEPT assets in its bucket(s) (kept
    * docs are exactly the bucket owners — the index only persists
    * kept docs' buckets) and returns ONE row:
    * (n_quarantined, n_true_dup, n_over_dropped, over_drop_bp) with
    * the rate in integer basis points. An asset whose only confirmable
    * partner was itself dropped counts as over-dropped here — the
    * resolver re-admits one representative of such a chain, so the
    * stat is the upper bound on what re-adjudication returns. Scale:
    * feature decode is per-partition streaming work, the only shuffle
    * is the bucket-keyed join of the (small) quarantine side against
    * kept — bucket-local, never pairwise over the corpus. */
  private[streaming] def overDropReport(
      spark: org.apache.spark.sql.SparkSession,
      quarantineDir: String, keptDir: String,
      features: DataFrame => DataFrame,
      sigCols: Seq[String], thresh: Long): DataFrame = {
    def feats(dir: String, p: String): DataFrame =
      features(spark.read.parquet(dir)
        .select(col("doc_id").as("asset_id"), lit("x").as("kind"),
          col("text").cast("binary").as("bytes")))
        .select(("asset_id" +: "bkt" +: sigCols).map(c => col(c).as(s"$p$c")): _*)
    val q = feats(quarantineDir, "q_")
    val k = feats(keptDir, "k_")
    val dist = sigCols.map(c => abs(col(s"q_$c") - col(s"k_$c")))
      .reduce(_ + _)
    val confirmed = q.join(k, col("q_bkt") === col("k_bkt"))
      .where(dist <= thresh)
      .select(col("q_asset_id").as("asset_id")).distinct()
    q.select(col("q_asset_id").as("asset_id")).distinct()
      .join(confirmed.withColumn("ok", lit(1L)), Seq("asset_id"), "left")
      .agg(count(lit(1)).as("n_quarantined"),
        // empty quarantine dir: sum over zero rows is null — coalesce
        // to 0 so the report reads (0, 0, 0, 0) instead of all-null.
        coalesce(sum(coalesce(col("ok"), lit(0L))), lit(0L)).as("n_true_dup"))
      .select(col("n_quarantined").cast("long").as("n_quarantined"),
        col("n_true_dup").cast("long").as("n_true_dup"),
        (col("n_quarantined") - col("n_true_dup")).cast("long").as("n_over_dropped"),
        expr("CAST(CASE WHEN n_quarantined = 0 THEN 0 " +
          "ELSE (n_quarantined - n_true_dup) * 10000 div n_quarantined END AS BIGINT)")
          .as("over_drop_bp"))
  }

  private[streaming] def startWith(signature: DataFrame => DataFrame,
      payload: Seq[String] = Seq("doc_id", "text"))(
      docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatchWith(signature, payload)(batch.toDF(), batchId, indexDir, keptDir, quarantineDir)
        () // foreachBatch wants Unit; the kept frame is for composed callers
      }
      .start()

  /** Start the streaming near-dup filter over a (doc_id, text) stream.
    * With `quarantineDir`, dropped docs are recorded with their drop
    * reason instead of silently excluded (see [[processBatchWith]]). */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    startWith(bucketIndex)(docs, checkpointDir, indexDir, keptDir, quarantineDir)
}

/** The EXACT-dedup gate on the same protocol: signature = one md5
  * bucket per doc (full-text hash), so a doc drops iff a byte-equal
  * text was already ingested (or a smaller doc_id ties in-batch) —
  * the streaming form of q18_dedup_exact's hash-groupBy, with the
  * identical index/marker idempotency NearDupStream proves. The
  * false-positive rate is md5-collision (~0), so no confirm stage and
  * no quarantine is needed: a bucket collision IS a duplicate. */
object ExactDupStream {

  private[graft] def md5Buckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit(0).as("band"), md5(col("text")).as("bucket"))

  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      payload: Seq[String] = Seq("doc_id", "text")): DataFrame =
    NearDupStream.processBatchWith(md5Buckets, payload)(batch, batchId, indexDir, keptDir)

  /** Start the streaming exact-dedup filter over a (doc_id, text)
    * stream. */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String): StreamingQuery =
    NearDupStream.startWith(md5Buckets)(docs, checkpointDir, indexDir, keptDir)
}

/** The EMBEDDING twin of [[NearDupStream]]: each micro-batch's vectors
  * are hyperplane-LSH-bucketed (the q18_ann_lsh 16-plane signature
  * over the quantized embedding — sign bits → one bucket) and dropped
  * on a bucket collision with the persisted index — streaming
  * embedding-cosine near-dup on the shared protocol. Candidate
  * filter: the exact quantized-dot cosine confirm lives in the batch
  * q18_dedup_embed operator; `quarantineDir` records gated vectors
  * (with their embeddings) for it. */
object EmbedDupStream {

  private def lshBuckets(d: DataFrame): DataFrame =
    graft.operators.SimilarityQueries.lshSig(d.sparkSession,
      d.select(col("doc_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("doc_id"), lit(0).as("band"), col("bucket"))

  private val payload = Seq("doc_id", "embedding")

  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): DataFrame =
    NearDupStream.processBatchWith(lshBuckets, payload)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** Start the streaming embedding near-dup filter over a
    * (doc_id, embedding) stream. */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    NearDupStream.startWith(lshBuckets, payload)(docs, checkpointDir, indexDir, keptDir, quarantineDir)
}

/** The SIMHASH twin of [[NearDupStream]]: each micro-batch's docs are
  * simhash-signed and dropped if any of their six 2-of-4 block-pair
  * keys (the pigeonhole blocking q18_simhash_pairs proves complete
  * for hamming ≤ 2) collides with the persisted index — streaming
  * simhash near-dup on the shared protocol. The gate is a candidate
  * filter: the exact bit_count(xor) ≤ 2 confirm lives in the batch
  * operator, and `quarantineDir` records gated docs for it. */
object SimhashDupStream {

  private[graft] def simhashKeys(docs: DataFrame): DataFrame =
    SimilarityQueries.simhashBuckets(docs)

  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None,
      payload: Seq[String] = Seq("doc_id", "text")): DataFrame =
    NearDupStream.processBatchWith(simhashKeys, payload)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** Start the streaming simhash near-dup filter over a
    * (doc_id, text) stream. */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    NearDupStream.startWith(simhashKeys)(docs, checkpointDir, indexDir, keptDir, quarantineDir)
}

/** The WINNOWING twin of [[NearDupStream]]: each micro-batch's docs
  * are fingerprinted by the q18_winnow scheme (4-word shingle hashes,
  * 5-hash window minima) and dropped if ANY fingerprint collides with
  * the persisted index — the streaming gate for shared-PASSAGE
  * ingestion, sensitive to any ≥8-word run already seen in the corpus
  * (winnowing's guarantee), where the minhash gate needs whole-doc
  * similarity. Aggressive BY DESIGN — one shared boilerplate line
  * gates a doc — so this is the candidate filter for a
  * quote/containment-heavy feed; `quarantineDir` records gated docs
  * for the batch q18_containment confirm, which decides
  * containment vs incidental overlap. Fingerprints are ~2/(w+1) of
  * 4-grams, so the index stays a bounded fraction of corpus token
  * count; the per-batch join is fingerprint-keyed, never pairwise. */
object WinnowDupStream {

  private[graft] def winnowKeys(docs: DataFrame): DataFrame =
    graft.operators.TextQueries.winnowFingerprints(docs)
      .select(col("doc_id"), lit(0).as("band"), col("fh").as("bucket"))

  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None,
      payload: Seq[String] = Seq("doc_id", "text")): DataFrame =
    NearDupStream.processBatchWith(winnowKeys, payload)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** Start the streaming winnowing-fingerprint filter over a
    * (doc_id, text) stream. */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    NearDupStream.startWith(winnowKeys)(docs, checkpointDir, indexDir, keptDir, quarantineDir)
}

/** The image-modality twin of [[NearDupStream]]: each micro-batch's
  * assets are REALLY decoded (the q18_image_dedup ImageIO path) and
  * dropped if their (dims, 2-bit-color) bucket collides with the
  * ever-growing persisted index — streaming near-dup for images, on
  * the exact batch protocol NearDupStream proves out (parquet bucket
  * index, batch-scoped overwrite subdirs, marker-file idempotency).
  * Single band: the image signature is one bucket per asset, so "any
  * band collides" degenerates to "the bucket collides". Pessimistic
  * in-batch ties (bucket-min survives) and no L1 confirm stage — the
  * stream gate is the candidate filter; borderline pairs that need
  * the exact distance go to the batch q18_image_dedup operator, the
  * same division of labor as NearDupStream vs the batch CC resolver.
  */
object ImageDupStream {

  /** (doc_id, band, bucket) from real image decode of a
    * (doc_id, text) frame (bytes = utf-8 of text, the multimodal
    * fixture convention). */
  private def imageBuckets(docs: DataFrame): DataFrame =
    graft.operators.TextQueries.imageFeatures(
      docs.select(col("doc_id").as("asset_id"), lit("img").as("kind"),
        col("text").cast("binary").as("bytes")))
      .select(col("asset_id").as("doc_id"), lit(0).as("band"),
        col("bkt").as("bucket"))

  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): DataFrame =
    NearDupStream.processBatchWith(imageBuckets)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** Start the streaming image near-dup filter over a (doc_id, text)
    * asset stream. With `quarantineDir`, dropped assets are recorded
    * with their drop reason for batch-side exact re-confirmation. */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    NearDupStream.startWith(imageBuckets)(docs, checkpointDir, indexDir, keptDir, quarantineDir)

  /** Over-drop rate of the image gate vs the batch q18_image_dedup
    * confirm (RGB L1 ≤ 96 within the (w, h, 2-bit-cell) bucket) —
    * see [[NearDupStream.overDropReport]]. */
  def quarantineReport(spark: org.apache.spark.sql.SparkSession,
      quarantineDir: String, keptDir: String): DataFrame =
    NearDupStream.overDropReport(spark, quarantineDir, keptDir,
      graft.operators.TextQueries.imageFeatures, Seq("r", "g", "b"), 96L)
}

/** The audio-modality twin of [[NearDupStream]]: each micro-batch's
  * assets are REALLY decoded (the q18_audio_dedup WAV path — JDK
  * parser + PCM feature scan) and dropped if their
  * (n_samples, zero_crossings, gain-cell) bucket collides with the
  * ever-growing persisted index. Same single-band degeneration,
  * pessimistic in-batch ties, and batch-operator division of labor as
  * ImageDupStream: the stream gate filters candidates, the exact
  * gain-delta confirm lives in batch q18_audio_dedup.
  */
object AudioDupStream {

  /** (doc_id, band, bucket) from real WAV decode of a (doc_id, text)
    * frame (bytes = utf-8 of text, the multimodal fixture
    * convention). */
  private def audioBuckets(docs: DataFrame): DataFrame =
    graft.operators.TextQueries.audioFeatures(
      docs.select(col("doc_id").as("asset_id"), lit("wav").as("kind"),
        col("text").cast("binary").as("bytes")))
      .select(col("asset_id").as("doc_id"), lit(0).as("band"),
        col("bkt").as("bucket"))

  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): DataFrame =
    NearDupStream.processBatchWith(audioBuckets)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** Start the streaming audio near-dup filter over a (doc_id, text)
    * asset stream. With `quarantineDir`, dropped assets are recorded
    * with their drop reason — assets in the same gain cell whose
    * delta the batch q18_audio_dedup confirm would REJECT are
    * re-admittable from quarantine instead of silently lost. */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    NearDupStream.startWith(audioBuckets)(docs, checkpointDir, indexDir, keptDir, quarantineDir)

  /** Over-drop rate of the audio gate vs the batch q18_audio_dedup
    * confirm (gain delta |Δpeak| ≤ 4000 within the
    * (n_samples, zero_crossings, gain-cell) bucket) —
    * see [[NearDupStream.overDropReport]]. */
  def quarantineReport(spark: org.apache.spark.sql.SparkSession,
      quarantineDir: String, keptDir: String): DataFrame =
    NearDupStream.overDropReport(spark, quarantineDir, keptDir,
      graft.operators.TextQueries.audioFeatures, Seq("peak"), 4000L)
}

/** The video-modality twin of [[NearDupStream]]: each micro-batch's
  * assets are REALLY demuxed (the q18_video_dedup GIF path — JDK
  * ImageIO frame reader over the multi-frame container) and dropped if
  * their (n_frames, 2-bit cells of both sampled frames) bucket collides with the
  * ever-growing persisted index. Same single-band degeneration,
  * pessimistic in-batch ties, and batch-operator division of labor as
  * Image/AudioDupStream: the stream gate filters candidates, the exact
  * two-frame L1 confirm lives in batch q18_video_dedup.
  */
object VideoDupStream {

  /** (doc_id, band, bucket) from real GIF demux of a (doc_id, text)
    * frame (bytes = utf-8 of text, the multimodal fixture
    * convention). */
  private def videoBuckets(docs: DataFrame): DataFrame =
    graft.operators.TextQueries.videoFeatures(
      docs.select(col("doc_id").as("asset_id"), lit("gif").as("kind"),
        col("text").cast("binary").as("bytes")))
      .select(col("asset_id").as("doc_id"), lit(0).as("band"),
        col("bkt").as("bucket"))

  def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): DataFrame =
    NearDupStream.processBatchWith(videoBuckets)(batch, batchId, indexDir, keptDir, quarantineDir)

  /** Start the streaming video near-dup filter over a (doc_id, text)
    * asset stream. With `quarantineDir`, dropped assets are recorded
    * with their drop reason — same-bucket assets whose two-frame L1
    * distance the batch q18_video_dedup confirm would REJECT are
    * re-admittable from quarantine instead of silently lost. */
  def start(docs: DataFrame, checkpointDir: String,
      indexDir: String, keptDir: String,
      quarantineDir: Option[String] = None): StreamingQuery =
    NearDupStream.startWith(videoBuckets)(docs, checkpointDir, indexDir, keptDir, quarantineDir)

  /** Over-drop rate of the video gate vs the batch q18_video_dedup
    * confirm (two-sampled-frame L1 ≤ 192 within the
    * (n_frames, both frames' 2-bit cells) bucket) —
    * see [[NearDupStream.overDropReport]]. */
  def quarantineReport(spark: org.apache.spark.sql.SparkSession,
      quarantineDir: String, keptDir: String): DataFrame =
    NearDupStream.overDropReport(spark, quarantineDir, keptDir,
      graft.operators.TextQueries.videoFeatures,
      Seq("r0", "g0", "b0", "rm", "gm", "bm"), 192L)
}
