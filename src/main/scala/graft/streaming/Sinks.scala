package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent event-append sink with the reference's outcome lattice
  * (CosmosStoreSink.fs:44-120): for each incoming per-stream span
  * `[i, n)` compared to the target's current next position:
  *
  *   Ok               target == i        → append everything
  *   Duplicate        target >= n        → append nothing
  *   PartialDuplicate i < target < n     → append the trimmed suffix
  *   PrefixMissing    target < i         → append nothing (gap!)
  *
  * `foreachBatch` is at-least-once, so this trim-by-(stream, idx) MERGE
  * is what turns it into exactly-once sink effects — re-delivered
  * batches classify as Duplicate and write nothing.
  *
  * Storage here is a parquet directory (what the container offers); on
  * a cluster the same logic targets a Delta/Iceberg table where MERGE
  * INTO is transactional. The classification plan is one broadcast-able
  * aggregate of the target's per-stream tails, not a full-table join —
  * at 100 TB the target tail summary is |streams|-sized, kept in a
  * compacted summary table.
  */
object AppendSink {

  /** Append `incoming(stream_name, idx, ...)` idempotently into the
    * parquet dir `target`. Returns per-island outcomes.
    *
    * Classification is per contiguous island, not per stream-batch
    * min/max: a batch carrying islands [0..1] and [3..3] appends only
    * the gap-free prefix and classifies the gapped island as
    * PrefixMissing (held for redelivery), so a gap is never persisted
    * and the late middle event can still classify as Ok later — the
    * reference sink's span-at-a-time contract (CosmosStoreSink.fs:76-83).
    * Islands are folded per stream in index order, each advancing the
    * effective target position the next island classifies against.
    */
  def appendIdempotent(
      spark: SparkSession, target: String, incoming: DataFrame): DataFrame = {
    val existing = tryReadTarget(spark, target)
    val tails = existing match {
      case Some(t) =>
        t.groupBy(col("stream_name")).agg((max(col("idx")) + 1).as("tgt_next"))
      case None =>
        spark.emptyDataFrame
          .withColumn("stream_name", lit(null).cast("string"))
          .withColumn("tgt_next", lit(null).cast("long"))
          .limit(0)
    }
    // Materialize the classification BEFORE mutating the target: the
    // lazy plan reads the target's file listing, which the append below
    // changes — collecting afterwards would re-classify against the
    // post-write state. The result is |islands in batch|-sized (bounded
    // by the micro-batch, not the table).
    import spark.implicits._
    val islandId = col("idx") - row_number().over(
      Window.partitionBy(col("stream_name")).orderBy(col("idx")))
    val islands = incoming.select(col("stream_name"), col("idx")).distinct()
      .withColumn("island", islandId)
      .groupBy(col("stream_name"), col("island"))
      .agg(min(col("idx")).as("i"), (max(col("idx")) + 1).as("n"))
      .join(broadcast(tails), Seq("stream_name"), "left")
      .withColumn("tgt", coalesce(col("tgt_next"), lit(0L)))
      .select(col("stream_name"), col("i"), col("n"), col("tgt"))
      .as[(String, Long, Long, Long)].collect()

    // Sequential per-stream fold in index order: an Ok/Partial island
    // advances the position the next island is judged against.
    val classified = islands.groupBy(_._1).toSeq.flatMap { case (stream, spans) =>
      classifyIslands(spans.head._4, spans.map(s => (s._2, s._3)))
        .map { case (i, n, tgt, outcome) => (stream, i, n, tgt, outcome) }
    }
    val spansDf = classified.toDF("stream_name", "i", "n", "tgt_next", "outcome")

    // Appended indexes form one contiguous [tgt0, effFinal) run per
    // stream (each accepted island starts exactly at the effective
    // position), so the write filter is a single broadcast range check.
    val ranges = classified.groupBy(_._1).toSeq.collect {
      case (stream, rows) if rows.exists(r => r._5 == "Ok" || r._5 == "PartialDuplicate") =>
        val from = rows.head._4 // initial target position for the stream
        val until = rows.collect { case (_, _, n, _, o) if o == "Ok" || o == "PartialDuplicate" => n }.max
        (stream, from, until)
    }
    if (ranges.nonEmpty) {
      val rangesDf = ranges.toDF("stream_name", "w_from", "w_until")
      incoming
        .join(broadcast(rangesDf), Seq("stream_name"))
        .where(col("idx") >= col("w_from") && col("idx") < col("w_until"))
        .drop("w_from", "w_until")
        .write.mode(SaveMode.Append).parquet(target)
    }
    spansDf
  }

  /** Retention pruning (CosmosStorePruner.fs:16-84): delete events with
    * idx <= pruneTo per stream; returns (pruned, retained) counts. */
  def prune(
      spark: SparkSession, target: String, pruneTo: Map[String, Long]): DataFrame = {
    import spark.implicits._
    val limits = pruneTo.toSeq.toDF("stream_name", "prune_to")
    val existing = tryReadTarget(spark, target)
      .getOrElse(throw new IllegalStateException(s"no target at $target"))
      .join(broadcast(limits), Seq("stream_name"), "left")
    val kept = existing.where(col("prune_to").isNull || col("idx") > col("prune_to"))
      .drop("prune_to")
    // Stats must be driver-materialized before the rewrite (same
    // read-what-you-mutate hazard as appendIdempotent).
    val stats = existing
      .groupBy(col("stream_name"))
      .agg(count(when(col("idx") <= col("prune_to"), 1)).as("pruned"),
        count(when(col("prune_to").isNull || col("idx") > col("prune_to"), 1)).as("retained"))
      .as[(String, Long, Long)].collect()
    // parquet has no transactional delete: write survivors to a staging
    // dir, then swap (a Delta `DELETE WHERE` on a cluster)
    val staging = target + ".staging"
    kept.write.mode(SaveMode.Overwrite).parquet(staging)
    val conf = spark.sparkContext.hadoopConfiguration
    val targetPath = new org.apache.hadoop.fs.Path(target)
    val fs = targetPath.getFileSystem(conf)
    fs.delete(targetPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), targetPath)
    stats.toSeq.toDF("stream_name", "pruned", "retained")
  }

  /** Pure island-classification fold (the sink's outcome lattice,
    * CosmosStoreSink.fs:76-83, span-at-a-time): given the target's
    * current next position and a batch's contiguous islands `[i, n)`,
    * classify each in index order, advancing the effective position on
    * every accepted island. Returns (i, n, tgtAtClassification, outcome).
    *
    * Invariants (property-tested in SinksLatticeSpec):
    *  - accepted spans are exactly the gap-free prefix from tgt;
    *  - the union of accepted ranges is one contiguous [tgt, effFinal);
    *  - islands beyond the first gap all classify PrefixMissing;
    *  - re-classifying the same batch against the advanced target is a
    *    no-op (every island Duplicate) — idempotent redelivery.
    */
  def classifyIslands(
      tgt: Long, islands: Seq[(Long, Long)]): Seq[(Long, Long, Long, String)] = {
    var eff = tgt
    islands.sortBy(_._1).map { case (i, n) =>
      val (outcome, nextEff) =
        if (eff < i) ("PrefixMissing", eff)
        else if (eff >= n) ("Duplicate", eff)
        else if (eff > i) ("PartialDuplicate", n)
        else ("Ok", n)
      val row = (i, n, eff, outcome)
      eff = nextEff
      row
    }
  }

  private def tryReadTarget(spark: SparkSession, target: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(target)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) Some(spark.read.parquet(target))
    else None
  }
}

/** Tiny-pointer-file reads, shared by [[CheckpointStore]],
  * [[AnnIndexStore]] and [[graft.sources.LeaseStore]]. Reads to EOF
  * rather than a pre-stat'd length:
  * a concurrent atomic pointer swap between getFileStatus and open
  * that GROWS the byte count (v=9 → v=10) would truncate a
  * fixed-length readFully to a parse of the stale prefix ("1"),
  * naming a version GC already deleted — a serving batch then fails
  * spuriously. EOF is whatever the open() resolved to, which on an
  * atomic-rename pointer is always one complete version string. */
private[graft] object PointerFile {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  def readString(fs: FileSystem, f: HPath): Option[String] =
    if (!fs.exists(f)) None
    else {
      val out = new java.io.ByteArrayOutputStream(32)
      val buf = new Array[Byte](256)
      val in = fs.open(f)
      try {
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      Some(new String(out.toByteArray, "UTF-8"))
    }
}

/** External checkpoint parity table (IFeedCheckpointStore,
  * src/Propulsion/Feed/Feed.fs:31-35): (source, tranche, group) → pos,
  * latest-wins. Structured Streaming's own offset/commit log is the
  * primary checkpoint; this table exists for interop with stores that
  * track positions externally, and for the `checkpoint show/override`
  * tooling surface (§2.11).
  *
  * Crash atomicity (found by the SCALING.md round-13 crash-resume
  * drive): the original overwrite-in-place rewrite could be SIGKILLed
  * between Spark's delete of the old files and the job commit, losing
  * EVERY position and leaving a dir that fails schema inference. Each
  * commit now lands in a fresh `v=N/` subdir and is published by an
  * atomic overwrite-rename of the `_current` pointer (the
  * [[AnnIndexStore]] discipline): a kill at any instant leaves
  * `_current` on the last complete version and the half-written dir
  * unreachable. GC after the swap retains exactly {current, current-1}
  * (current-1 stays: a reader that resolved it just before the swap may
  * still be scanning) and removes everything else — older versions,
  * crash-leftover versions ABOVE current (their pointer move never
  * happened), and orphaned pointer temp files. Pointer + GC go through
  * the Hadoop FileSystem API, same as the parquet data, so the store
  * works unchanged on hdfs:// / s3a:// dirs (FileContext.rename with
  * Rename.OVERWRITE is the atomic publish on HDFS and local; on S3 the
  * rename is copy+delete — there, point this at an HDFS/EFS scratch dir
  * or swap the table for a JDBC/Delta upsert, as the original delegated
  * to DynamoDB/SQL).
  *
  * Multi-writer fencing (round 15): the reference delegates checkpoint
  * concurrency to transactional stores (Cosmos etag / SQL `on conflict
  * do update`); the parquet store applies the [[graft.sources.LeaseStore]]
  * fence pattern to its pointer instead. Each commit (a) writes its
  * table to a PRIVATE `v=<N>-<nonce>` dir — two interleaved committers
  * can never interleave part files in one dir — and (b) publishes by
  * verify-rename-verify on `_current`: snapshot the pointer it read,
  * re-check it is unchanged immediately before the overwrite-rename,
  * and re-read after; a committer that finds another's content at
  * either check LOSES CLEANLY (deletes its unreferenced data dir,
  * throws ConcurrentModificationException — the caller re-reads and
  * reapplies). As with LeaseStore, the read-compare-rename window is
  * the documented local-FS caveat vs a true conditional write: a
  * microsecond-interleaved double rename can drop the first loser's
  * update silently, but the store can never mix versions or regress
  * the pointer to a half-written dir, and every detected race throws.
  * GC keeps {current, previous} by NAME and otherwise deletes only
  * strictly-older VERSIONS immediately; same-or-newer-version debris
  * (a racing committer's in-flight dir) is age-gated (1 h) so a sweep
  * can never yank a live competitor's staging. */
object CheckpointStore {

  import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Parsed pointer: (version, current dir name, previous dir name).
    * Two generations: a plain integer `N` (pre-fencing layout — dirs
    * named `v=N`) and the fenced `N:curDir:prevDir` (prevDir `-` when
    * none). */
  private[streaming] final case class Pointer(version: Long, cur: String, prev: Option[String])

  private def parsePointer(s: String): Option[Pointer] = {
    val t = s.trim
    t.toLongOption match {
      case Some(n) => Some(Pointer(n, s"v=$n", if (n > 1) Some(s"v=${n - 1}") else None))
      case None => t.split(':') match {
        case Array(n, cur, prev) =>
          n.toLongOption.map(v => Pointer(v, cur, Some(prev).filter(_ != "-")))
        case _ => None
      }
    }
  }

  private def currentPointer(fs: FileSystem, root: HPath): Option[(String, Pointer)] =
    PointerFile.readString(fs, new HPath(root, "_current"))
      .flatMap(raw => parsePointer(raw).map(p => (raw, p)))

  /** Version number encoded in a data dir's name (`v=N` legacy or
    * `v=N-<nonce>` fenced); None for anything else. */
  private def dirVersion(name: String): Option[Long] =
    if (!name.startsWith("v=")) None
    else name.drop(2).takeWhile(_ != '-').toLongOption

  /** Test seam (spec-only): runs between a commit's data write and its
    * publish CAS — the window an interleaved competing commit lands in. */
  private[streaming] var beforePublish: () => Unit = () => ()

  def commit(spark: SparkSession, dir: String,
      source: String, tranche: String, group: String, pos: Long): Unit = {
    import spark.implicits._
    val (fs, root) = fsFor(spark, dir)
    fs.mkdirs(root)
    // snapshot the pointer FIRST, then read the table AT that snapshot:
    // the publish CAS below verifies against these exact bytes, so a
    // competing commit landing anywhere after this line is detected
    val snapshot = currentPointer(fs, root)
    val updated = readAt(spark, dir, fs, root, snapshot.map(_._2))
      .filter(r => !(r._1 == source && r._2 == tranche && r._3 == group))
      .appended((source, tranche, group, pos))
    val v = snapshot.map(_._2.version).getOrElse(0L) + 1L
    // PRIVATE data dir per attempt: interleaved committers can race the
    // pointer but never interleave part files in one dir
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dirName = s"v=$v-$nonce"
    updated.toDF("source", "tranche", "group", "pos")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$dirName")
    beforePublish()
    val newContent = s"$v:$dirName:${snapshot.map(_._2.cur).getOrElse("-")}"
    val tmp = new HPath(root, s"_current.tmp$nonce")
    val out = fs.create(tmp, true)
    try out.write(newContent.getBytes("UTF-8")) finally out.close()
    CrashPoint.maybe("ckpt-pre-swap") // data written+tmp staged, pointer still old
    def lose(): Nothing = {
      try { fs.delete(new HPath(root, dirName), true); fs.delete(tmp, false) }
      catch { case scala.util.control.NonFatal(_) => () }
      throw new java.util.ConcurrentModificationException(
        s"checkpoint commit fenced off: another committer moved $dir/_current " +
          "(re-read and reapply)")
    }
    // fenced CAS (LeaseStore discipline): verify unchanged → rename →
    // verify ours. The verify-rename window is the documented local-FS
    // caveat; every race outside it throws here or at the re-read.
    if (PointerFile.readString(fs, new HPath(root, "_current")) != snapshot.map(_._1)) lose()
    val fc = FileContext.getFileContext(fs.getUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(fs.makeQualified(tmp), fs.makeQualified(new HPath(root, "_current")),
      Options.Rename.OVERWRITE)
    catch {
      // a winner's sweep may have collected our staged tmp in the
      // verify→rename window — that's a detected race, lose cleanly
      case _: java.io.FileNotFoundException => lose()
    }
    if (!PointerFile.readString(fs, new HPath(root, "_current")).contains(newContent)) lose()
    CrashPoint.maybe("ckpt-pre-gc") // pointer swapped, stale versions not yet GC'd
    // first versioned commit over a legacy flat layout: the legacy root
    // data files were absorbed into v=1 above — remove them so a later
    // lost/corrupt pointer surfaces as "empty" rather than silently
    // serving the stale pre-versioned positions
    gcSweep(fs, root, keep = Set(dirName) ++ snapshot.map(_._2.cur),
      prevVersion = v - 1, legacyToo = snapshot.isEmpty)
  }

  def position(spark: SparkSession, dir: String,
      source: String, tranche: String, group: String): Option[Long] =
    read(spark, dir).collectFirst {
      case (s, t, g, p) if s == source && t == tranche && g == group => p
    }

  def read(spark: SparkSession, dir: String): List[(String, String, String, Long)] = {
    val (fs, root) = fsFor(spark, dir)
    readAt(spark, dir, fs, root, currentPointer(fs, root).map(_._2))
  }

  private def readAt(spark: SparkSession, dir: String, fs: FileSystem, root: HPath,
      ptr: Option[Pointer]): List[(String, String, String, Long)] = {
    import spark.implicits._
    ptr match {
      case Some(p) =>
        spark.read.parquet(s"$dir/${p.cur}")
          .select("source", "tranche", "group", "pos")
          .as[(String, String, String, Long)].collect().toList
      case None =>
        // legacy flat layout (pre-versioned dirs written by older
        // builds): data files at the root. A root holding no data files
        // (empty, or only a crash's _temporary) reads as empty.
        val hasData = fs.exists(root) && fs.listStatus(root).exists { s =>
          s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")
        }
        if (!hasData) Nil
        else spark.read.parquet(dir)
          .select("source", "tranche", "group", "pos")
          .as[(String, String, String, Long)].collect().toList
    }
  }

  /** Best-effort removal of everything except the two reachable
    * version dirs {current, previous} — superseded versions, orphaned
    * `_current.tmp*` pointer files, and (with `legacyToo`) the
    * pre-versioned flat-layout data files at the root (they were just
    * absorbed into v=1). Deletion is IMMEDIATE only for dirs whose
    * encoded version is strictly below the previous version — those
    * can only be superseded history or junk. A dir at the same or a
    * newer version that is not reachable (a racing committer's
    * in-flight data dir, a crash's unreferenced attempt, a tmp pointer
    * file) is deleted only once it is an hour old, so a sweep can
    * never yank a LIVE competitor's staging out from under its
    * publish. Failures are swallowed (a retained stale version costs
    * bytes, never correctness). */
  private def gcSweep(fs: FileSystem, root: HPath, keep: Set[String],
      prevVersion: Long, legacyToo: Boolean): Unit = {
    try {
      val ageCutoff = System.currentTimeMillis() - 3600_000L
      fs.listStatus(root).foreach { s =>
        val name = s.getPath.getName
        val stale =
          if (keep.contains(name) || name == "_current") false
          else dirVersion(name) match {
            case Some(n) => n < prevVersion || s.getModificationTime < ageCutoff
            case None =>
              name.startsWith("_current.tmp") ||
                (legacyToo && !name.startsWith("v="))
          }
        if (stale) {
          CrashPoint.maybe("ckpt-mid-gc") // pointer live, sweep partially done
          fs.delete(s.getPath, true)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
