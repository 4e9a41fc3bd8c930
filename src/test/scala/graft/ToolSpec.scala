package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** CLI-level drive of every Tool subcommand (SURVEY §2.11) against
  * sf0.001 — each test goes through Tool.main exactly as an operator
  * would, capturing stdout. Tool.main owns its SparkSession lifecycle
  * (create + stop per invocation), so this suite deliberately holds no
  * session of its own while a subcommand runs.
  */
class ToolSpec extends AnyFunSuite {

  private def runTool(args: String*): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      Tool.main(args.toArray)
    }
    bos.toString("UTF-8")
  }

  test("checkpoint-show on an empty store reports no checkpoints") {
    val dir = Files.createTempDirectory("graft-tool-cp0").toString + "/cp"
    assert(runTool("checkpoint-show", dir).contains("(no checkpoints)"))
  }

  test("checkpoint-override then checkpoint-show round-trips positions") {
    val dir = Files.createTempDirectory("graft-tool-cp").toString + "/cp"
    assert(runTool("checkpoint-override", dir, "feedA", "0", "g1", "42")
      .contains("checkpoint set: feedA/0/g1 -> 42"))
    runTool("checkpoint-override", dir, "feedA", "1", "g1", "7")
    // latest-wins on the same key
    runTool("checkpoint-override", dir, "feedA", "0", "g1", "99")
    val shown = runTool("checkpoint-show", dir)
    assert(shown.contains("pos=99") && shown.contains("pos=7"))
    assert(!shown.contains("pos=42"), shown)
    assert(shown.linesIterator.count(_.contains("feedA")) == 2, shown)
  }

  test("stats summarizes a store by stream: write_pos and event counts") {
    val dir = Files.createTempDirectory("graft-tool-store").toString + "/store"
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import spark.implicits._
      Seq(("user-1", 0L), ("user-1", 1L), ("user-1", 2L), ("user-2", 0L))
        .toDF("stream_name", "idx")
        .write.mode(SaveMode.Overwrite).parquet(dir)
    } finally spark.stop()
    val out = runTool("stats", dir)
    // user-1: write_pos = max(idx)+1 = 3, n=3; user-2: write_pos 1, n=1
    assert(out.contains("user-1") && out.contains("user-2"), out)
    assert(out.replaceAll("\\s+", " ").contains("user-1 |3 |3"), out)
    assert(out.replaceAll("\\s+", " ").contains("user-2 |1 |1"), out)
  }

  test("corpus-report prints the full report card for sf0.001") {
    val out = runTool("corpus-report", "/root/testdata/sf0.001")
    // per-(source, lang) grain plus rollup rows with the q18 columns
    assert(out.contains("n_docs") && out.contains("pass_permille"), out.take(500))
    assert(out.linesIterator.count(_.startsWith("|")) > 10, out.take(500))
  }

  test("quarantine-stats emits one labeled over-drop row per supplied gate") {
    // drive ONE deterministic batch through the image gate (the
    // QuarantineReportSpec probe fixture: md5-derived signatures) to
    // produce real quarantine/kept dirs, then read the stat back
    // through the CLI exactly as an operator would
    val root = Files.createTempDirectory("graft-tool-quar").toString
    val (indexDir, keptDir, quarDir) = (s"$root/idx", s"$root/kept", s"$root/quar")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import spark.implicits._
      val docs = (0 until 600).map(i => (i.toLong, s"probe-$i")).toDF("doc_id", "text")
      streaming.ImageDupStream.processBatch(docs, 0L, indexDir, keptDir, Some(quarDir))
    } finally spark.stop()
    val out = runTool("quarantine-stats", s"image=$quarDir:$keptDir")
    assert(out.contains("modality") && out.contains("over_drop_bp"), out.take(500))
    assert(out.linesIterator.exists(l => l.contains("image") && l.startsWith("|")), out)
    // the identity the report guarantees: n_true_dup + n_over_dropped =
    // n_quarantined, all non-null on a non-empty quarantine
    val row = out.linesIterator.find(_.contains("image")).get
    val nums = row.split("\\|").map(_.trim).filter(_.matches("\\d+")).map(_.toLong)
    assert(nums.length == 4, row)
    assert(nums(0) == nums(1) + nums(2), row)
  }

  test("sync-feed usage line names every flag the parser accepts") {
    // r15 shipped --canonical but the usage error omitted it — the
    // round's flagship flag was undiscoverable from the very message
    // that gates it. Pin the full usage text so a parser/usage drift
    // fails here instead of in an operator's terminal.
    assert(Tool.syncFeedUsage ==
      "usage: sync-feed <sfDir> <workDir> [--gate neardup|exact|simhash|winnow] " +
        "[--ranges N] [--max-items N] [--canonical]")
    for (flag <- Seq("--gate", "--ranges", "--max-items", "--canonical"))
      assert(Tool.syncFeedUsage.contains(flag), s"usage omits $flag")
  }

  test("sync-feed round-trips every event through change-feed -> spans -> kafka frame") {
    val work = Files.createTempDirectory("graft-tool-syncfeed").toString + "/w"
    val out = runTool("sync-feed", "/root/testdata/sf0.001", work)
    assert(out.contains("caught up"), out)
    // parse the produced kafka-frame values back (the consumer's path)
    // and compare against the staged feed row-for-row: the composed
    // sync must deliver EVERY event exactly once, stream-ordered
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      val consumed = functions.SpanCodec.parseSpans(
        spark.read.parquet(s"$work/topic")
          .select(col("value").cast("string").as("value")))
        .select("stream_name", "idx", "event_type", "data")
      val fed = spark.read.parquet(s"$work/feed")
        .select("stream_name", "idx", "event_type", "data")
      assert(consumed.count() == fed.count())
      assert(consumed.exceptAll(fed).isEmpty && fed.exceptAll(consumed).isEmpty,
        "consumed set != fed set")
      // spans preserve per-stream idx order by construction: parseSpans
      // rebuilds idx = i + position, so equality above already implies
      // ordered delivery; pin the lease table reached the tail
      val leases = new graft.sources.LeaseStore(s"$work/leases")
      assert(leases.readAll(4).forall(_.exists(_.continuation > 0)))
    } finally spark.stop()
    // re-running the command is a no-op resume: feed not restaged, no
    // new pages admitted (continuations already at tail)
    val again = runTool("sync-feed", "/root/testdata/sf0.001", work)
    assert(again.contains("feed already staged"), again)
    assert(again.contains("pages=0"), again)
  }

  test("sync-feed --gate neardup admits kept docs only, exactly once") {
    val work = Files.createTempDirectory("graft-tool-syncgate").toString + "/w"
    val out = runTool("sync-feed", "/root/testdata/sf0.001", work, "--gate", "neardup")
    assert(out.contains("caught up"), out)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      val kept = spark.read.parquet(s"$work/kept").select("doc_id").distinct().count()
      val quar = spark.read.parquet(s"$work/quar").select("doc_id").distinct().count()
      val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
      assert(kept + quar == total, s"kept=$kept quar=$quar total=$total")
      // the topic carries exactly the kept docs, one message each
      val produced = spark.read.parquet(s"$work/topic")
        .select(col("key").cast("string")).distinct().count()
      assert(produced == kept, s"produced=$produced kept=$kept")
    } finally spark.stop()
    val again = runTool("sync-feed", "/root/testdata/sf0.001", work, "--gate", "neardup")
    assert(again.contains("pages=0"), again)

    // a REPLAYED page must overwrite, never double: rewind range 0's
    // continuation (a lost-checkpoint / failed-over consumer) and
    // re-run — same pages, same epochs, same batch subdirs; the gate's
    // markers short-circuit its writes, the topic subdirs are
    // overwritten with identical content
    val spark2 = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    val (topicBefore, keptBefore) =
      try (spark2.read.parquet(s"$work/topic").count(),
        spark2.read.parquet(s"$work/kept").count())
      finally spark2.stop()
    val leases = new graft.sources.LeaseStore(s"$work/leases")
    val l0 = leases.read(0).get
    assert(leases.tryWrite(Some(l0), l0.copy(fence = l0.fence + 1, continuation = -1L)))
    val replay = runTool("sync-feed", "/root/testdata/sf0.001", work, "--gate", "neardup")
    assert(!replay.contains("pages=0"), replay) // range 0 genuinely re-paged
    val spark3 = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      assert(spark3.read.parquet(s"$work/topic").count() == topicBefore)
      assert(spark3.read.parquet(s"$work/kept").count() == keptBefore)
    } finally spark3.stop()
  }

  test("sync-feed composes every shared-protocol gate; exact gate partitions the corpus") {
    // exact: a bucket collision IS a duplicate (md5 full-text), so
    // kept = one doc per distinct text as seen in doc_id order across
    // pages — pinned against the corpus-wide distinct-count identity
    val work = Files.createTempDirectory("graft-tool-syncexact").toString + "/w"
    // flags BEFORE the positionals: the arg parser must consume each
    // flag's value token (the old startsWith("--") partition silently
    // bound sfDir='exact' in this order)
    val out = runTool("sync-feed", "--gate", "exact", "/root/testdata/sf0.001", work)
    assert(out.contains("caught up"), out)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      val kept = spark.read.parquet(s"$work/kept")
      val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      // per-text: exactly one kept representative (no quarantine stage —
      // md5 collisions are the only false-positive mode)
      assert(kept.select("text").distinct().count() == kept.count())
      assert(kept.select("text").distinct().count() ==
        total.select("text").distinct().count())
    } finally spark.stop()
    // simhash and winnow compose on the same protocol: drive one page
    // end-to-end each (full-corpus runs are the near-dup/exact tests'
    // job; this pins the CLI wiring of the other two gates)
    for (g <- Seq("simhash", "winnow")) {
      val w2 = Files.createTempDirectory(s"graft-tool-sync$g").toString + "/w"
      val o2 = runTool("sync-feed", "/root/testdata/sf0.001", w2,
        "--gate", g, "--ranges", "1", "--max-items", "100000")
      assert(o2.contains("caught up") && !o2.contains("pages=0"), o2)
    }
  }

  test("sync-feed --canonical: the canonical kept set is invariant to admission interleaving") {
    // gated resume is SET-equivalent by design: which cluster
    // representative survives depends on inter-range admission order,
    // which is exactly what a crash/resume perturbs. The canonical
    // post-pass must erase that freedom: runs whose interleaving
    // differs STRUCTURALLY (1 range × 1 page vs 4 ranges × many pages)
    // land bit-identical canonical/kept digests.
    val digests = for ((ranges, items) <- Seq(("1", "100000"), ("4", "120"))) yield {
      val w = Files.createTempDirectory(s"graft-tool-canon$ranges").toString + "/w"
      val out = runTool("sync-feed", "--gate", "neardup", "--ranges", ranges,
        "--max-items", items, "--canonical", "/root/testdata/sf0.001", w)
      val m = "canonical kept=(\\d+) digest=(-?\\d+)".r.findFirstMatchIn(out)
      assert(m.isDefined, s"no canonical line in: ${out.takeRight(400)}")
      (m.get.group(1).toLong, m.get.group(2))
    }
    assert(digests.distinct.size == 1,
      s"canonical output depends on admission interleaving: $digests")
    assert(digests.head._1 > 0)
  }

  test("import-export parses a DynamoDB export and writes ready/pending span sets") {
    val dir = Files.createTempDirectory("graft-tool-ddb")
    val outDir = Files.createTempDirectory("graft-tool-ddb-out").toString + "/idx"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir.toString, "data.jsonl"),
      Seq(
        """{"Item":{"p":{"S":"Account-a1"},"n":{"N":"3"},"c":{"L":[{"S":"E0"},{"S":"E1"},{"S":"E2"}]}}}""",
        """{"Item":{"p":{"S":"Order-o1"},"n":{"N":"4"},"c":{"L":[{"S":"P2"},{"S":"P3"}]}}}"""
      ).mkString("\n").getBytes("UTF-8"))
    val out = runTool("import-export", dir.toString, outDir, "2")
    // A's 3 events -> 2 bounded batches ready; O's post-gap island pends
    assert(out.contains("2 ready span batches, 1 pending islands"), out)
  }
}
