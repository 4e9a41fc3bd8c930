package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Measurement hygiene (round-4 finding: per-query numbers were
  * order-contaminated — whichever queries ran LAST absorbed 2-5×
  * phantom regressions from accumulated JVM/GC state):
  *  - every query runs REPS times (default 3), each rep over the whole
  *    suite in a different deterministically-shuffled order, and the
  *    reported per-query time is the MEDIAN across reps — a slow outlier
  *    from suite position affects one rep, not the median;
  *  - the printed JSON rounds to milliseconds AND limits its "queries"
  *    map to the headline set below — rounds 3-5 all had "parsed: null"
  *    because the 104-query line (~3 KB) outgrew the driver's
  *    tail-capture window, which starts mid-JSON; the full-precision
  *    all-query result is always written to BENCH_LAST.json;
  *  - a regression guard compares each query's per-rep MIN against the
  *    recorded best for the same SF in bench_best.json (2× threshold,
  *    matching the driver's gate); the min is the load-robust statistic
  *    (rounds 8+10: co-run driver benches inflated medians ~1.3×
  *    uniformly and produced spurious flags that solo runs cleared —
  *    ambient load rarely slows ALL reps of a query whose suite
  *    position rotates, a real plan regression slows every rep).
  *    Violations land in a "guard" map; per-rep raw times and a system
  *    load-average sample land in BENCH_LAST.json so flags can be
  *    adjudicated from data; the best file is refreshed with new
  *    per-rep minima afterwards.
  *  - the guard normalizes for MACHINE drift (round-11 finding: a
  *    container reboot landed the suite on a slower host — every one
  *    of 127 queries inflated, median per-rep-min ratio 1.68× vs best,
  *    10 spurious flags incl. queries untouched for rounds): a
  *    deterministic CPU probe (SplitMix64 sum, single-thread and
  *    all-cores) runs before the timed loop, its per-boot minimum is
  *    recorded next to the query bests (`_calib1`/`_calibN`), and the
  *    guard divides each per-rep min by the measured slowdown vs the
  *    fastest machine that ever set a best (never below 1.0 — a
  *    faster machine doesn't tighten the gate). Same machine ⇒ drift
  *    ≈ 1 ⇒ behavior unchanged; a real plan regression scales WITH
  *    the probe and still flags. Each would-be flag then gets 2 extra
  *    reps and is re-judged on the improved min (variance flags clear,
  *    real regressions are slow in every rep).
  *
  * A short untimed warmup absorbs JVM/codegen startup so the per-query
  * numbers measure the plans, not JIT. AQE is on (as it would be on a
  * cluster): skew splits and partition coalescing are part of the
  * engine's scale story.
  */
object Bench {

  private def jnum(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Deterministic CPU-bound probe (SplitMix64 mix-sum): cache-resident,
    * branch-free, JIT-stable — tracks clock speed / IPC, which is what
    * cross-boot host drift changes. Returns the sum so the JIT can't
    * dead-code the loop. */
  private def splitmixSum(iters: Long, seed: Long): Long = {
    var x = seed; var s = 0L; var i = 0L
    while (i < iters) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      s += z ^ (z >>> 31)
      i += 1
    }
    s
  }

  private val CalibIters = 150000000L

  /** (single-thread secs, all-cores secs): min of 3 timed runs each,
    * after an untimed JIT warmup. ~2 s total. */
  private def calibrate(threads: Int): (Double, Double) = {
    splitmixSum(CalibIters / 8, 11L) // JIT warmup, untimed
    val single = (0 until 3).map { r =>
      val t0 = System.nanoTime()
      splitmixSum(CalibIters, 100 + r.toLong)
      (System.nanoTime() - t0) / 1e9
    }.min
    val multi = (0 until 3).map { r =>
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { splitmixSum(CalibIters, 1000L * t + r) : Unit })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }.min
    (single, multi)
  }

  /** IO-side ambient probe (round 18): the trajectory A/B proved the
    * CPU pair has a blind spot — the r18 quiet-boot window inflated
    * the suite 86% while the CPU probe moved only 31%, and the
    * smoking gun was IO-shaped (copy_build 90 s vs 5.9 s on identical
    * warm data). This probe times a fixed 64 MiB write+fsync+read+
    * delete cycle in the fixture's filesystem, min of 3, so every
    * bench artifact carries an IO-responsiveness sample next to the
    * CPU pair. Recorded for ADJUDICATION (is this window IO-taxed?),
    * not folded into drift normalization — it has no reference pair
    * yet and write buffering makes cross-host comparison softer than
    * the CPU probe's. */
  private def calibrateIo(dir: String): Double = {
    val MB = 64
    val buf = new Array[Byte](1 << 20)
    new java.util.Random(42).nextBytes(buf)
    try {
      (0 until 3).map { r =>
        val p = java.nio.file.Paths.get(dir, s".graft_ioprobe_$r")
        try {
          val t0 = System.nanoTime()
          val ch = java.nio.channels.FileChannel.open(p,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
          try {
            var i = 0
            while (i < MB) { ch.write(java.nio.ByteBuffer.wrap(buf)); i += 1 }
            ch.force(true)
          } finally ch.close()
          val in = java.nio.channels.FileChannel.open(p,
            java.nio.file.StandardOpenOption.READ)
          try {
            val rb = java.nio.ByteBuffer.allocate(1 << 20)
            var n = in.read(rb)
            while (n >= 0) { rb.clear(); n = in.read(rb) }
          } finally in.close()
          (System.nanoTime() - t0) / 1e9
        } finally java.nio.file.Files.deleteIfExists(p) // never leak the 64 MiB probe (ADVICE r18)
      }.min
    } catch { case scala.util.control.NonFatal(_) => -1.0 } // read-only dir etc.
  }

  /** Headline queries for the stdout line: the historically slowest /
    * most plan-interesting queries (also the SCALING.md study set).
    * Everything else is in BENCH_LAST.json only.
    */
  val headline: Vector[String] = Vector(
    "q18_cc_dedup", "q18_source_overlap", "q18_tfidf_sim", "q18_bigram_lp",
    "q18_nb_langid", "q18_pagerank", "q13_topk", "q18_edit_dedup",
    "q18_pq_encode", "q21_index_hydrate", "q18_ann_ivf", "q16_late_drop",
    "q18_ann_ivfpq")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // shuffle-partitions override for the SCALING.md study rig: the
    // default (= cpus) is right for the driver's sf0.1 parity runs, but
    // large-SF studies under-report with 32 partitions (substring_dedup
    // at 60×: 11.7 s @32 vs 9.3 s @64 — SCALING.md r10); partitions
    // should scale ∝ data there, as they would on a real cluster.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      // local[N, 2] = one task retry, like a cluster (maxFailures
      // defaults to 4 there, but to 1 in local mode): a transient
      // spill-read flake (JDK NativeThreadSet race under the
      // ReadAheadInputStream prefetcher, seen once at the 60× tier)
      // costs one retried task, not the whole query; a deterministic
      // failure still fails both attempts and reports.
      .master(s"local[$cpus,2]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Let AQE rewrite sort-merge joins to shuffled-hash at runtime
      // when every post-shuffle partition of the build side fits in
      // 64 MB (optimization round 19; guide §3.1/§9 recommendation).
      // Runtime-guarded, so scale-safe by construction: a 100 TB
      // shuffle's partitions exceed the threshold and sort-merge
      // stays; at any scale where the condition holds, dropping the
      // two sorts is strictly cheaper. Interleaved same-boot A/B over
      // the SMJ-bearing queries (containment/quality/confirm family,
      // index_hydrate, hybrid_rrf, prep_v2): consistent ~5-10%
      // per-query gains, no regressions outside noise.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture wide copies (ScaleOps.wideRead) build once per fixture
    // fingerprint: force them BEFORE anything is timed and report the
    // build separately — a cold run's headline otherwise silently
    // carries the one-off copy cost (~7 s at sf0.1) that a warm run
    // doesn't pay, and a reader can't tell the two apart
    // failure isolation (round-9 lesson: a broken `events` fixture in
    // this untimed preamble crashed the whole run → rc=1, zero bench
    // evidence for the round). Preamble/warmup failures are recorded
    // under "_preamble:*" keys and the run continues: the per-query
    // loop catches its own errors, so one broken table degrades the
    // bench to partial data instead of erasing it.
    val preambleErrors = collection.mutable.LinkedHashMap.empty[String, String]
    val copy0 = System.nanoTime()
    for (t <- Seq("documents", "embeddings", "events", "lineitem"))
      try graft.operators.ScaleOps.wideRead(spark, sfDir, t)
      catch { case e: Throwable =>
        preambleErrors(s"_preamble:$t") = s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    // shared derived corpus frames (fingerprinted parquet copies, same
    // once-per-fixture discipline as the wide copies): force them here
    // so their one-off build cost lands in copy_build_secs, not inside
    // whichever consumer query a rep's shuffle happens to run first
    try {
      graft.operators.SimilarityQueries.docShingles(spark, sfDir)
      graft.operators.TextQueries.hllShingles(spark, sfDir)
    } catch { case e: Throwable =>
      preambleErrors("_preamble:shingles") = s"${e.getClass.getSimpleName}: ${e.getMessage}"
    }
    val copyBuildSecs = (System.nanoTime() - copy0) / 1e9

    // warmup: touch every table + exercise codegen/shuffle once
    for (w <- Seq("q06_stream_hwm", "q12_agg"))
      SparkEntry.queries.get(w).foreach { f =>
        try f(spark, sfDir).count()
        catch { case e: Throwable =>
          preambleErrors(s"_warmup:$w") = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      }

    // optional comma-separated filter for local iteration and the
    // SCALING.md study; the driver never sets it (its runs cover all)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toVector.sorted
      .filter(n => only.forall(_.contains(n)))
    val times = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    val errors = collection.mutable.LinkedHashMap.empty[String, String]
    // ambient-load indicator (1-min system load average, sampled before
    // and after the timed loop): lets a reader separate "this JVM was
    // co-run with other work" from a genuine per-query regression when
    // adjudicating guard flags
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadBefore = loadAvg
    // CPU drift probe (see scaladoc): measured before the timed loop so
    // the suite's own GC can't pollute it; compared against the fastest
    // machine that ever set a best for this SF.
    val (calib1, calibN) = calibrate(cpus.toInt)
    // probe the working filesystem (tmpdir = where shuffle/wide copies
    // live), NEVER the read-only fixture dir
    val calibIo = calibrateIo(System.getProperty("java.io.tmpdir", "/tmp"))
    val wall0 = System.nanoTime()
    for (rep <- 0 until reps) {
      // deterministic per-rep shuffle: suite position rotates across
      // reps, so position-dependent slowdowns can't follow one query
      val order = new scala.util.Random(rep * 7919 + 17).shuffle(names)
      for (name <- order if !errors.contains(name)) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      }
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    val loadAfter = loadAvg

    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      s((s.size - 1) / 2)
    }
    // A failing query must not masquerade as a fast run: reported as -1
    // with the error in the `errors` map.
    val medians: Vector[(String, Double)] =
      names.map(n => n -> (if (errors.contains(n) || times(n).isEmpty) -1.0 else median(times(n))))
    val mins: Map[String, Double] =
      names.iterator.map(n => n -> (if (times(n).isEmpty) -1.0 else times(n).min)).toMap

    // Regression guard vs the recorded per-SF best (2× = driver's gate).
    val sfKey = Paths.get(sfDir).getFileName.toString
    val bestPath = Paths.get("bench_best.json")
    val recorded: Map[String, Double] =
      if (!Files.exists(bestPath)) Map.empty
      else {
        val txt = new String(Files.readAllBytes(bestPath), StandardCharsets.UTF_8)
        val sec = s""""$sfKey"\\s*:\\s*\\{([^}]*)\\}""".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
        """"([^"]+)"\s*:\s*([-0-9.eE]+)""".r.findAllMatchIn(sec)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    // Noise floor: sub-second queries trip a pure-ratio guard on
    // ambient jitter (a 0.06 s best vs a 0.13 s rep is "2.2×" but
    // means nothing), so a violation must also exceed the best by an
    // absolute 0.3 s — real regressions on load-bearing queries clear
    // both bars, millisecond flutter clears neither.
    //
    // The guard statistic is the per-rep MIN, not the median (rounds 8
    // and 10 lesson): end-of-round driver benches co-run with other
    // round-close work and inflate EVERY rep roughly uniformly (r10:
    // whole-suite median 1.34× vs best, six spurious 2× flags, all
    // cleared by solo reruns). A real plan regression slows the
    // FASTEST rep too; transient co-run load rarely hits all reps of a
    // query that rotates suite position per rep. The median is still
    // what's reported per query (the honest central estimate) — the
    // min only decides violations, and the raw per-rep times land in
    // BENCH_LAST.json so any flag can be re-adjudicated from data.
    // Machine-drift normalization: how much slower is this boot than
    // the machine that set EACH best? Every refreshed best records the
    // calib pair in effect when it was set (`<q>:c1`/`<q>:cN` keys —
    // round-12 fix: normalizing against the global fastest-ever calib
    // double-discounted bests that were themselves set on a slow host,
    // masking real regressions on slower boots). Bests predating the
    // snapshots fall back to the global `_calibN<cpus>`-keyed floor
    // (the multi-core probe depends on the thread count, so a
    // different SPARK_GRAFT_CPUS run must not mix baselines) and then
    // the legacy un-keyed `_calib1`/`_calibN`. Never below 1.0 — a
    // faster machine doesn't tighten the gate. The probe tracks clock/
    // IPC drift only (an I/O- or memory-bandwidth-bound shift is
    // invisible to it — documented limitation; the second-chance reps
    // and raw arrays are the backstop there).
    val calibNKey = s"_calibN$cpus"
    def driftFor(n: String): Double = {
      val c1 = recorded.getOrElse(s"$n:c1",
        recorded.getOrElse("_calib1", calib1))
      val cN = recorded.getOrElse(s"$n:cN",
        recorded.getOrElse(calibNKey, recorded.getOrElse("_calibN", calibN)))
      math.max(1.0, math.max(calib1 / c1, calibN / cN))
    }
    val drift = math.max(1.0, math.max(
      recorded.get("_calib1").map(calib1 / _).getOrElse(1.0),
      recorded.get(calibNKey).orElse(recorded.get("_calibN")).map(calibN / _).getOrElse(1.0)))
    def judge(m: Map[String, Double]): Vector[(String, Double)] =
      medians.collect {
        case (n, _) if m.getOrElse(n, -1.0) > 0 &&
            recorded.get(n).exists(b =>
              b > 0 && m(n) / driftFor(n) > 2 * b && m(n) / driftFor(n) - b > 0.3) =>
          n -> (m(n) / driftFor(n) / recorded(n))
      }
    // Second chance for would-be flags: min-of-3 has high variance on a
    // noisy host (round-11: 3-rep mins for four queries sat 1.4-1.7×
    // above their own 5-rep mins on the same binary and machine), so
    // each candidate flag gets 2 extra reps and is re-judged on the
    // improved min. A real regression survives — EVERY rep is slow — a
    // variance flag clears. Retry reps land in the raw arrays; medians
    // are untouched (still the honest 3-rep central estimate).
    val minsF: Map[String, Double] = {
      val m = collection.mutable.Map(mins.toSeq: _*)
      for ((n, _) <- judge(mins); _ <- 0 until 2) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          times(n) = times(n) :+ dt
          m(n) = math.min(m(n), dt)
        } catch { case _: Throwable => () }
      }
      m.toMap
    }
    val guardFails = judge(minsF)
    // refresh the best file with new minima (guard judges BEFORE
    // refresh); start from `recorded` so a filtered run can't drop the
    // minima of queries it didn't execute. Each IMPROVED best also
    // snapshots this run's calib pair (`<q>:c1`/`<q>:cN`) so future
    // drift normalization compares against the machine that actually
    // set it. The global probes refresh min-wise (legacy fallback for
    // pre-snapshot bests): the un-keyed/_calibN<cpus> references stay
    // the fastest machine seen.
    val improved: Map[String, Double] = minsF.collect {
      case (n, v) if v > 0 && v < recorded.getOrElse(n, Double.MaxValue) => n -> v
    }
    val calibSnapshots: Map[String, Double] =
      improved.keysIterator.flatMap(n => Seq(s"$n:c1" -> calib1, s"$n:cN" -> calibN)).toMap
    val newBest = recorded ++ improved ++ calibSnapshots ++
      Seq("_calib1" -> calib1, "_calibN" -> calibN, calibNKey -> calibN)
        .map { case (k, v) => k -> math.min(v, recorded.getOrElse(k, Double.MaxValue)) }
    if (newBest.nonEmpty) {
      val others =
        if (!Files.exists(bestPath)) Vector.empty
        else {
          val txt = new String(Files.readAllBytes(bestPath), StandardCharsets.UTF_8)
          """"(sf[^"]*)"\s*:\s*\{([^}]*)\}""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2)).filterNot(_._1 == sfKey).toVector
        }
      val mine = newBest.toVector.sortBy(_._1)
        .map { case (n, v) => s""""$n":${jnum(v)}""" }.mkString(",")
      val all = (others.map { case (k, body) => s""""$k":{$body}""" } :+ s""""$sfKey":{$mine}""")
        .mkString("{", ",", "}")
      Files.write(bestPath, all.getBytes(StandardCharsets.UTF_8))
    }

    // ---- per-execution ("uncached") pass (optimization round 20,
    // VERDICT r19 follow-up 1): the steady-state numbers above are the
    // SESSION-CACHE steady state — for queries whose declared pipeline
    // includes a derivation the SessionCache memoizes (band index,
    // candidate pairs, vocabs, centroids...), the median excludes that
    // derivation after its first touch. This pass re-times every query
    // with EVERY derivation-cache class bypassed
    // (CacheResidence.setNoMemo("all")): each execution re-derives its
    // artifacts — trainer jobs, driver collects, checkpoints included —
    // so "queries_uncached" is the honest per-execution cost of the
    // pipeline each query declares. Fingerprinted parquet
    // materializations (wideRead copies, docShingles/hllShingles) stay:
    // they are on-disk ingest-layout artifacts, built once per fixture
    // and already reported separately (copy_build_secs). Both numbers
    // ship: "queries" keeps the r19-comparable steady-state methodology
    // (reps, ordering, median — unchanged), "queries_uncached" is the
    // per-execution truth the optimization report cites. The guard and
    // bench_best refresh above judge the steady pass only — the two
    // metrics must never mix.
    val uncachedReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_UNCACHED_REPS", "2").toInt
    val timesU = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    val errorsU = collection.mutable.LinkedHashMap.empty[String, String]
    val wallU0 = System.nanoTime()
    if (uncachedReps > 0) {
      graft.operators.CacheResidence.setNoMemo(Set("all"))
      try {
        for (rep <- 0 until uncachedReps) {
          val order = new scala.util.Random(rep * 104729 + 31).shuffle(names)
          for (name <- order if !errors.contains(name) && !errorsU.contains(name)) {
            val fn = SparkEntry.queries(name)
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).count()
              timesU(name) = timesU(name) :+ (System.nanoTime() - t0) / 1e9
            } catch {
              case e: Throwable =>
                errorsU(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
            }
          }
        }
      } finally graft.operators.CacheResidence.setNoMemo(Set.empty)
    }
    val wallU = (System.nanoTime() - wallU0) / 1e9
    val mediansU: Vector[(String, Double)] =
      names.map(n => n -> (if (errorsU.contains(n) || timesU(n).isEmpty) -1.0
        else { val s = timesU(n).sorted; s((s.size - 1) / 2) }))
    val totalU = mediansU.collect { case (_, v) if v > 0 => v }.sum

    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160) + "\""
    def qmapOf(ms: Vector[(String, Double)], render: Double => String,
        only: Option[Set[String]]) = ms
      .collect { case (k, v) if only.forall(_.contains(k)) => s""""$k":${render(v)}""" }
      .mkString("{", ",", "}")
    def qmap(render: Double => String, only: Option[Set[String]]) =
      qmapOf(medians, render, only)
    val errs = (preambleErrors ++ errors ++
      errorsU.map { case (k, e) => s"_uncached:$k" -> e })
      .map { case (k, e) => s""""$k":${jstr(e)}""" }.mkString("{", ",", "}")
    val guard = guardFails.map { case (k, r) => s""""$k":${jnum(r)}""" }.mkString("{", ",", "}")
    val total = medians.collect { case (_, v) if v > 0 => v }.sum
    val loadJson = s""""load":{"before":${jnum(loadBefore)},"after":${jnum(loadAfter)},"cpus":$cpus},""" +
      s""""calib":{"single":${jnum(calib1)},"multi":${jnum(calibN)},"drift":${jnum(drift)},"io":${jnum(calibIo)}}"""
    // raw per-rep times (file only — ~4 KB for the full suite): the
    // evidence a guard-flag adjudication needs without a rerun
    val rawJson = names
      .map(n => s""""$n":[${times(n).map(jnum).mkString(",")}]""")
      .mkString("{", ",", "}")
    // uncached-pass block: total always in stdout; the per-query map is
    // headline-limited on stdout (tail-capture budget) and complete in
    // the file line
    def uncachedJson(render: Double => String, only: Option[Set[String]]) =
      if (uncachedReps <= 0) ""
      else s""""value_uncached":${render(totalU)},"uncached_reps":$uncachedReps,""" +
        s""""uncached_wall":${render(wallU)},""" +
        s""""queries_uncached":${qmapOf(mediansU, render, only)},"""
    def line(render: Double => String, only: Option[Set[String]]) =
      s"""{"metric":"total","value":${render(total)},"unit":"sec","reps":$reps,"wall":${render(wall)},""" +
        s""""copy_build_secs":${jnum(copyBuildSecs)},$loadJson,""" +
        uncachedJson(render, only) +
        s""""queries":${qmap(render, only)},"errors":$errs,"guard":$guard,"sf":"$sfDir"}"""
    // full precision to a file (survives any stdout limit). A filtered
    // (SPARK_GRAFT_BENCH_ONLY) run goes to its own file so a local
    // subset run can never clobber the last full-suite record.
    val lastFile = if (only.isDefined) "BENCH_LAST_FILTERED.json" else "BENCH_LAST.json"
    val rawUJson = names
      .map(n => s""""$n":[${timesU(n).map(jnum).mkString(",")}]""")
      .mkString("{", ",", "}")
    val fullLine = line(_.toString, None).dropRight(1) +
      s""","raw":$rawJson,"raw_uncached":$rawUJson}"""
    Files.write(Paths.get(lastFile), fullLine.getBytes(StandardCharsets.UTF_8))
    // ...and a short ms-rounded headline-only line to stdout (~600 bytes),
    // sized to survive the driver's tail-capture window intact
    println(line(jnum, Some(headline.toSet)))
    spark.stop()
    if (guardFails.nonEmpty)
      System.err.println(s"[bench] guard: ${guardFails.size} queries exceed 2x recorded best " +
        s"(see guard map); best refreshed afterwards")
  }
}
