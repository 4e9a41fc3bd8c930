package graft.streaming

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
  *    atomic overwrite-rename of a temp file, so a reader between
  *    micro-batches flips from v=N to v=N+1 in one step and can never
  *    observe a half-written index;
  *  - GC after the swap retains exactly {current, current-1}: a
  *    serving micro-batch that resolved `_current` = N just before a
  *    swap to N+1 is still scanning v=N's parquet, so the
  *    immediately-superseded version must outlive one refresh (the
  *    [[CheckpointStore]] retention rule; AnnIndexRefreshSpec's
  *    interleaved test drives a refresh INSIDE the resolve→read
  *    window). Everything else goes: versions ≤ current-2, unsealed
  *    crash leftovers above current, orphaned `_current.tmp*`. Two
  *    refreshes inside ONE in-flight batch would collect that batch's
  *    version — the serving cadence must be faster than the refresh
  *    cadence, which it is by orders of magnitude in any real gate;
  *  - a `_refreshing` lease fail-fasts concurrent refreshes, exactly
  *    like compactIndex's `_compacting` (stale-lease remediation is
  *    the same: remove it if no refresher is running);
  *  - the index content is computed by the BATCH query's own
  *    expressions (SimilarityQueries.ivfIndexOf), so a refreshed index
  *    equals a cold rebuild on the same rows bit-for-bit —
  *    AnnIndexRefreshSpec pins serve-across-refresh == cold rebuild.
  *
  * Pointer, lease, markers and GC all go through the Hadoop
  * FileSystem API — the same filesystem the parquet data lands on —
  * so the store works unchanged on an hdfs:// index dir (the
  * round-13 java.nio form silently split pointer state onto the
  * local disk for any non-local dir).
  *
  * At 100 TB the qn frame is the thing you'd bucket by label on disk;
  * the swap/lease protocol is unchanged — only the two parquet writes
  * grow with the corpus, and both are single-pass. */
object AnnIndexStore {

  import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  // read-to-EOF, never a pre-stat'd fixed length (PointerFile scaladoc:
  // a concurrent swap growing the digit count would truncate the parse)
  private def readVersion(fs: FileSystem, root: HPath): Option[Long] =
    PointerFile.readString(fs, new HPath(root, "_current")).flatMap(_.trim.toLongOption)

  /** Build (or refresh) the index from a (vec_id, label, embedding)
    * frame into a fresh version and atomically make it current.
    * Returns the new version number. */
  def refresh(spark: SparkSession, embeddings: DataFrame, indexDir: String): Long = {
    val (fs, root) = fsFor(spark, indexDir)
    fs.mkdirs(root)
    val leasePath = new HPath(root, "_refreshing")
    if (fs.exists(leasePath) || !fs.createNewFile(leasePath))
      throw new IllegalStateException(
        s"$indexDir is being refreshed (lease $indexDir/_refreshing present); " +
          "wait for the running refresh — or, if none is running, remove the stale lease")
    try {
      val v = readVersion(fs, root).getOrElse(0L) + 1L
      val vdir = s"$indexDir/v=$v"
      val (qn, cent) = graft.operators.SimilarityQueries.ivfIndexOf(embeddings)
      qn.write.mode(SaveMode.Overwrite).parquet(s"$vdir/qn.parquet")
      cent.write.mode(SaveMode.Overwrite).parquet(s"$vdir/cent.parquet")
      fs.createNewFile(new HPath(root, s"v=$v/_complete")) // seal AFTER both writes
      // atomic pointer swap: temp write + overwrite-rename, never a partial read
      val tmp = new HPath(root, s"_current.tmp$v")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      CrashPoint.maybe("ann-pre-swap") // v sealed + tmp staged, pointer still old
      val fc = FileContext.getFileContext(fs.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(new HPath(root, "_current")),
        Options.Rename.OVERWRITE)
      CrashPoint.maybe("ann-pre-gc") // pointer swapped, stale versions not yet swept
      gcSweep(fs, root, v)
      v
    } finally fs.delete(leasePath, false)
  }

  /** Best-effort removal of everything except {current, current-1}
    * version dirs, the pointer and the lease: superseded versions,
    * unsealed crash leftovers above current, orphaned `_current.tmp*`.
    * Failures are swallowed — a retained stale version costs bytes,
    * never correctness. */
  private def gcSweep(fs: FileSystem, root: HPath, current: Long): Unit = {
    try {
      fs.listStatus(root).foreach { s =>
        val name = s.getPath.getName
        val stale =
          (name.startsWith("v=") &&
            name.drop(2).toLongOption.exists(n => n != current && n != current - 1)) ||
          name.startsWith("_current.tmp")
        if (stale) {
          CrashPoint.maybe("ann-mid-gc") // pointer live, sweep partially done
          fs.delete(s.getPath, true)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** The serving version `_current` points to, if any. */
  def currentVersion(spark: SparkSession, indexDir: String): Option[Long] = {
    val (fs, root) = fsFor(spark, indexDir)
    readVersion(fs, root)
  }

  /** Load the CURRENT index (qn, cent) for serving. Only a sealed
    * version can ever be current (refresh writes `_current` after the
    * `_complete` marker), so an unmarked crash-leftover dir is
    * unreachable from here.
    *
    * `onResolve` is the resolve→read seam: it fires after `_current`
    * has been resolved but before the version dir is opened —
    * AnnIndexRefreshSpec injects a full refresh there to prove a
    * batch in flight across the swap still completes on the version
    * it resolved (GC retains current-1 precisely for that reader). */
  def load(spark: SparkSession, indexDir: String,
      onResolve: Long => Unit = _ => ()): (DataFrame, DataFrame) = {
    val (fs, root) = fsFor(spark, indexDir)
    val v = readVersion(fs, root).getOrElse(
      throw new IllegalStateException(s"no current index version under $indexDir"))
    onResolve(v)
    val vdir = s"$indexDir/v=$v"
    require(fs.exists(new HPath(root, s"v=$v/_complete")),
      s"current version $v under $indexDir is not sealed — refusing to serve")
    (spark.read.parquet(s"$vdir/qn.parquet"),
      spark.read.parquet(s"$vdir/cent.parquet"))
  }

  /** Serve one micro-batch of (qid, vec) probes against the CURRENT
    * index version — re-resolves `_current` per call, so a refresh
    * completing between micro-batches takes effect on the next batch
    * with no gate restart (the refresh boundary AnnIndexRefreshSpec
    * drives). `onResolve` threads through to [[load]]'s resolve→read
    * seam. */
  def serveCurrent(spark: SparkSession, batch: DataFrame, indexDir: String,
      k: Int, excludeSelf: Boolean = false,
      onResolve: Long => Unit = _ => ()): DataFrame = {
    val (qn, cent) = load(spark, indexDir, onResolve)
    AnnServeGate.serve(batch, qn, cent, k, excludeSelf)
  }
}
