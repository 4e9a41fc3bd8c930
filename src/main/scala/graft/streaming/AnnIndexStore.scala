package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned persistence + atomic swap for the IVF serving index —
  * the refresh half of the index/serve split [[AnnServeGate]] serves
  * the static half of. Production ANN serving re-centroids and
  * re-assigns as the corpus grows; this store makes that a safe
  * operation against a live serving gate:
  *
  *  - every (re)build lands in a fresh `v=N/` subdir (qn.parquet +
  *    cent.parquet) and is sealed with a `_complete` marker AFTER both
  *    writes — a crash mid-build leaves an unmarked dir that nothing
  *    reads (the compactIndex marker discipline, NearDupStream);
  *  - `_current` names the serving version and is swapped with an
  *    ATOMIC_MOVE of a temp file, so a reader between micro-batches
  *    flips from v=N to v=N+1 in one step and can never observe a
  *    half-written index;
  *  - a `_refreshing` lease fail-fasts concurrent refreshes, exactly
  *    like compactIndex's `_compacting` (stale-lease remediation is
  *    the same: remove it if no refresher is running);
  *  - the index content is computed by the BATCH query's own
  *    expressions (SimilarityQueries.ivfIndexOf), so a refreshed index
  *    equals a cold rebuild on the same rows bit-for-bit —
  *    AnnIndexRefreshSpec pins serve-across-refresh == cold rebuild.
  *
  * At 100 TB the qn frame is the thing you'd bucket by label on disk;
  * the swap/lease protocol is unchanged — only the two parquet writes
  * grow with the corpus, and both are single-pass. */
object AnnIndexStore {

  private def currentFile(indexDir: String) = Paths.get(indexDir, "_current")
  private def lease(indexDir: String) = Paths.get(indexDir, "_refreshing")

  /** Build (or refresh) the index from a (vec_id, label, embedding)
    * frame into a fresh version and atomically make it current.
    * Returns the new version number. */
  def refresh(spark: SparkSession, embeddings: DataFrame, indexDir: String): Long = {
    Files.createDirectories(Paths.get(indexDir))
    if (Files.exists(lease(indexDir)))
      throw new IllegalStateException(
        s"$indexDir is being refreshed (lease ${lease(indexDir)} present); " +
          "wait for the running refresh — or, if none is running, remove the stale lease")
    Files.createFile(lease(indexDir))
    try {
      val v = currentVersion(indexDir).getOrElse(0L) + 1L
      val vdir = s"$indexDir/v=$v"
      val (qn, cent) = graft.operators.SimilarityQueries.ivfIndexOf(embeddings)
      qn.write.mode(SaveMode.Overwrite).parquet(s"$vdir/qn.parquet")
      cent.write.mode(SaveMode.Overwrite).parquet(s"$vdir/cent.parquet")
      Files.createFile(Paths.get(vdir, "_complete")) // seal AFTER both writes
      // atomic pointer swap: temp write + ATOMIC_MOVE, never a partial read
      val tmp = Paths.get(indexDir, s"_current.tmp$v")
      Files.write(tmp, v.toString.getBytes("UTF-8"))
      Files.move(tmp, currentFile(indexDir),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      v
    } finally Files.deleteIfExists(lease(indexDir))
  }

  /** The serving version `_current` points to, if any. */
  def currentVersion(indexDir: String): Option[Long] = {
    val f = currentFile(indexDir)
    if (!Files.exists(f)) None
    else Some(new String(Files.readAllBytes(f), "UTF-8").trim.toLong)
  }

  /** Load the CURRENT index (qn, cent) for serving. Only a sealed
    * version can ever be current (refresh writes `_current` after the
    * `_complete` marker), so an unmarked crash-leftover dir is
    * unreachable from here. */
  def load(spark: SparkSession, indexDir: String): (DataFrame, DataFrame) = {
    val v = currentVersion(indexDir).getOrElse(
      throw new IllegalStateException(s"no current index version under $indexDir"))
    val vdir = s"$indexDir/v=$v"
    require(Files.exists(Paths.get(vdir, "_complete")),
      s"current version $v under $indexDir is not sealed — refusing to serve")
    (spark.read.parquet(s"$vdir/qn.parquet"),
      spark.read.parquet(s"$vdir/cent.parquet"))
  }

  /** Serve one micro-batch of (qid, vec) probes against the CURRENT
    * index version — re-resolves `_current` per call, so a refresh
    * completing between micro-batches takes effect on the next batch
    * with no gate restart (the refresh boundary AnnIndexRefreshSpec
    * drives). */
  def serveCurrent(spark: SparkSession, batch: DataFrame, indexDir: String,
      k: Int, excludeSelf: Boolean = false): DataFrame = {
    val (qn, cent) = load(spark, indexDir)
    AnnServeGate.serve(batch, qn, cent, k, excludeSelf)
  }
}
