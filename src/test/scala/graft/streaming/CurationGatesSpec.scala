package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Gopher and DSIR gates must classify/score exactly like
  * their batch twins, across micro-batch boundaries and under
  * redelivery (both gates are stateless, so identical output on resend
  * is the structural property being pinned). */
class CurationGatesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-curationgates-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs =
    Envelope.readTable(spark, "/root/testdata/sf0.001", "documents")

  /** Streams `rows` in two batches + a redelivery of batch 1 through
    * `gate`, collecting (doc_id -> result row values) and asserting the
    * redelivered batch classified identically to its first pass. */
  private def drive(rows: Array[(Long, String)])(
      gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[Any]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val results = new scala.collection.mutable.HashMap[Long, Seq[Any]]()
    var redeliveryMismatch = false
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", tmp("cp-gate"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        gate(batch).collect().foreach { r =>
          val id = r.getAs[Long]("doc_id")
          val vals = r.toSeq.drop(1)
          results.synchronized {
            if (results.contains(id) && results(id) != vals) redeliveryMismatch = true
            results(id) = vals
          }
        }
        ()
      }
      .start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    q.stop()
    assert(!redeliveryMismatch, "redelivered batch classified differently")
    results.toMap
  }

  test("Gopher gate matches the batch rule flags, stable under redelivery") {
    import spark.implicits._
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val got = drive(rows)(CurationGates.gopherClassify)
    val expected = CurationGates.gopherClassify(docs.select(col("doc_id"), col("text")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1)).toMap
    assert(got == expected)
    // fixture sanity: the rules actually split the corpus
    val kept = expected.values.count(_.last == true)
    assert(kept > 0 && kept < expected.size, s"kept $kept of ${expected.size}")
    // and the gate flags aggregated per source must reproduce the BATCH
    // OPERATOR's report exactly (gate vs q18_gopher_quality, not gate
    // vs itself — the rules are shared in CurationRules, this pins it)
    val srcOf = docs.select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    val gateAgg = got.toSeq.groupBy { case (id, _) => srcOf(id) }
      .map { case (src, m) =>
        val fs = m.map(_._2.map(_.asInstanceOf[Boolean]))
        src -> Seq[Long](m.size, fs.count(_(4)), fs.count(!_(0)),
          fs.count(!_(1)), fs.count(!_(2)), fs.count(!_(3)))
      }
    val report = graft.operators.CurationQueries.q18GopherQuality
      .build(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (1 to 6).map(r.getLong(_)).toSeq).toMap
    assert(gateAgg == report)
  }

  test("calibration gate keeps each source's top half; unknown sources drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = docs.select(col("doc_id"), col("source"), col("text"))
    val thr = CurationGates.calibThresholds(corpus).cache()
    val nSources = corpus.select("source").distinct().count()
    assert(thr.count() == nSources)
    // stream in two batches + redelivery via a 3-column MemoryStream
    val rows = corpus.as[(Long, String, String)].collect()
    val results = scala.collection.mutable.Map.empty[Long, Boolean]
    var mismatch = false
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDS().toDF("doc_id", "source", "text")
      .writeStream.option("checkpointLocation", tmp("cp-calib"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        CurationGates.calibClassify(b, thr).collect().foreach { r =>
          val id = r.getAs[Long]("doc_id"); val k = r.getAs[Boolean]("keep")
          results.synchronized {
            if (results.get(id).exists(_ != k)) mismatch = true
            results(id) = k
          }
        }
        ()
      }.start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    q.stop()
    assert(!mismatch, "redelivered batch classified differently")
    // batch twin: per-source, kept count == the calibrated n_kept
    val expected = CurationGates.calibClassify(corpus, thr)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(results.toMap == expected)
    // threshold semantics: at least half of each source kept, never all
    val bySource = corpus.select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    expected.groupBy { case (id, _) => bySource(id) }.foreach { case (src, m) =>
      val kept = m.values.count(identity)
      assert(2 * kept >= m.size, s"$src kept $kept of ${m.size}")
    }
    // per-source kept counts must equal the BATCH OPERATOR's n_kept
    // (q18_quality_calib's all-in-at-threshold semantics)
    val batchKept = graft.operators.CurationQueries.q18QualityCalib
      .build(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    val gateKept = expected.groupBy { case (id, _) => bySource(id) }
      .map { case (src, m) => src -> m.values.count(identity).toLong }
    assert(gateKept == batchKept)
    // unknown source: never kept
    val foreign = Seq((999999L, "src-unknown", "the a of and to in is x y z"))
      .toDF("doc_id", "source", "text")
    assert(CurationGates.calibClassify(foreign, thr)
      .collect().head.getAs[Boolean]("keep") == false)
  }

  test("PII gate redacts identically to the batch scrub, stable under redelivery") {
    import spark.implicits._
    // same deterministic PII injection the batch oracle uses (fixture
    // text carries no PII of its own — injection IS the test fixture)
    val injected = docs.select(col("doc_id"), expr(
      """concat(text, ' contact user', CAST(doc_id % 1000 AS STRING),
        | '@mail-', CAST(doc_id % 7 AS STRING), '.example from 10.',
        | CAST(doc_id % 256 AS STRING), '.0.', CAST(doc_id % 100 AS STRING),
        | ' call ', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-',
        | lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-',
        | lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"""
        .stripMargin.replaceAll("\n\\s*", "")).as("text"))
    val rows = injected.as[(Long, String)].collect()
    val got = drive(rows)(CurationGates.piiScrub)
    val expected = CurationGates.piiScrub(injected)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1)).toMap
    assert(got == expected)
    // every doc carries injected PII and the gate says so
    assert(expected.values.forall(_(3) == true))
    // re-running the gate over its own scrubbed output finds nothing —
    // redacted text is clean, not just counted
    val rescrub = CurationGates.piiScrub(CurationGates.piiScrub(injected)
      .select(col("doc_id"), col("scrubbed").as("text"))).collect()
    assert(rescrub.forall(!_.getAs[Boolean]("had_pii")),
      "scrubbed text still matches a PII pattern")
    // per-source rollup of gate outputs equals the BATCH OPERATOR's
    // report (q18_pii_scrub — shared CurationRules, this pins it)
    val srcOf = docs.select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    val lenOf = rows.map { case (id, t) => id -> t.length }.toMap
    val gateAgg = got.toSeq.groupBy { case (id, _) => srcOf(id) }
      .map { case (src, m) =>
        src -> Seq[Long](m.size,
          m.map(_._2(0).asInstanceOf[Int].toLong).sum,
          m.map(_._2(1).asInstanceOf[Int].toLong).sum,
          m.map(_._2(2).asInstanceOf[Int].toLong).sum,
          m.map { case (id, v) =>
            (lenOf(id) - v(4).asInstanceOf[String].length).toLong }.sum)
      }
    val report = graft.operators.TextQueries.q18PiiScrub
      .build(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (1 to 5).map(r.getLong(_)).toSeq).toMap
    assert(gateAgg == report)
  }

  test("DSIR gate scores identically to the batch model, stable under redelivery") {
    import spark.implicits._
    // static model trained offline on the full corpus, target = 'de'
    val delta = CurationGates.dsirDelta(docs, "de").cache()
    assert(delta.count() <= 256)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val got = drive(rows)(b => CurationGates.dsirScore(b, delta))
    val expected = CurationGates.dsirScore(docs.select(col("doc_id"), col("text")), delta)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1)).toMap
    assert(got == expected)
    // weights must discriminate (not all equal) for the gate to be useful
    assert(expected.values.map(_.last).toSet.size > 1)
    // gate scores must equal the BATCH OPERATOR's top-50 rows (same
    // target slice, same corpus — q18_dsir, not the gate run in batch)
    graft.operators.CurationQueries.q18Dsir.build(spark, "/root/testdata/sf0.001")
      .collect().foreach { r =>
        assert(got(r.getAs[Long]("doc_id")) ==
          Seq(r.getAs[Long]("n_tok"), r.getAs[Long]("weight_unm")),
          s"doc ${r.getAs[Long]("doc_id")} gate/batch mismatch")
      }
  }

  test("BPE tokenize gate matches the batch encode, stable under redelivery") {
    import spark.implicits._
    // static artifact: merges trained offline on the full corpus —
    // same trainer the batch q18_bpe_merges/q18_bpe_encode use
    val merges = graft.operators.TextQueries
      .trainBpeMerges(spark, "/root/testdata/sf0.001")
      .map { case (_, a, b, _) => (a, b) }
    assert(merges.size == 8)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val got = drive(rows)(b => CurationGates.bpeTokenize(b, merges))
    // every doc tokenized, counts discriminate, merges actually fired
    // (n_tokens < n_chars means at least one pair merged somewhere)
    assert(got.size == rows.length)
    assert(got.values.map(_(1)).toSet.size > 1)
    assert(got.values.map(_(1).asInstanceOf[Long]).sum <
      got.values.map(_(2).asInstanceOf[Long]).sum)
    // gate counts must equal the BATCH OPERATOR's sampled rows
    // (q18_bpe_encode — occurrence-level fold vs vocab-fold + join)
    val batch = graft.operators.TextQueries.q18BpeEncode
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      assert(got(r.getAs[Long]("doc_id")) ==
        Seq(r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chars")),
        s"doc ${r.getAs[Long]("doc_id")} gate/batch mismatch")
    }
  }

  test("WordPiece gate matches the batch encode, stable under redelivery") {
    import spark.implicits._
    // static artifact: the vocab trained offline on the full corpus —
    // same trainer the batch q18_wordpiece uses
    val vocab = graft.operators.TextQueries
      .trainWordpieceVocab(spark, "/root/testdata/sf0.001")
    assert(vocab.nonEmpty)
    assert(vocab.count(_.length > 1) <= 256, "word slice exceeds the cap")
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val got = drive(rows)(b => CurationGates.wordpieceTokenize(b, vocab))
    // every doc tokenized; multi-char pieces actually fired somewhere
    // (pieces < one-per-char means a vocab word matched)
    assert(got.size == rows.length)
    assert(got.values.map(_(1).asInstanceOf[Long]).sum <
      rows.map(_._2.count(_ != ' ').toLong).sum)
    // gate counts must equal the BATCH OPERATOR's sampled rows
    // (q18_wordpiece — occurrence-level fold vs vocab-fold + join)
    val batch = graft.operators.TextQueries.q18Wordpiece
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      assert(got(r.getAs[Long]("doc_id")) ==
        Seq(r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"),
          r.getAs[Long]("n_unk")),
        s"doc ${r.getAs[Long]("doc_id")} gate/batch mismatch")
    }
  }

  test("perplexity gate matches the batch held-out scorer, stable under redelivery") {
    import spark.implicits._
    // the batch query's split rule: train on 'train', score 'val'
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
    val sp = docs.select(col("doc_id"), col("source"), col("text"),
      when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
    val (vocab, pre, v) = CurationGates.bigramLm(
      sp.where(col("split") === "train").select(col("doc_id"), col("text")))
    assert(v > 0L)
    val valDocs = sp.where(col("split") === "val")
    val rows = valDocs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val got = drive(rows)(b => CurationGates.perplexityScore(b, vocab, pre, v))
    // roll the gate's per-doc rows up to source grain and compare with
    // the batch q18_heldout_ppl output (same smoothing, same micro-nat
    // rounding -> integer equality, not a tolerance)
    val srcOf = valDocs.select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    val rollup = got.toSeq
      .map { case (id, vals) =>
        // vals = (n_bg, sur_upm, avg_upm, n_oov)
        (srcOf(id), (1L, vals(0).asInstanceOf[Long], vals(1).asInstanceOf[Long],
          vals(3).asInstanceOf[Long]))
      }
      .groupMapReduce(_._1)(_._2) { case ((a1, a2, a3, a4), (b1, b2, b3, b4)) =>
        (a1 + b1, a2 + b2, a3 + b3, a4 + b4)
      }
    val batch = graft.operators.CurationQueries.q18HeldoutPpl
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val s = r.getAs[String]("source")
      val (nDocs, nBg, sur, oov) = rollup(s)
      assert(nDocs == r.getAs[Long]("n_docs"), s"$s n_docs")
      assert(nBg == r.getAs[Long]("n_bigrams"), s"$s n_bigrams")
      assert(sur == r.getAs[Long]("sur_upm"), s"$s sur_upm")
      assert(sur / nBg == r.getAs[Long]("avg_upm"), s"$s avg_upm")
      assert(oov == r.getAs[Long]("n_oov"), s"$s n_oov")
    }
    assert(rollup.keySet == batch.map(_.getAs[String]("source")).toSet)
  }

  test("unigram gate matches the batch segmentation cost, stable under redelivery") {
    import spark.implicits._
    // static artifact: the piece-cost vocab trained offline on the
    // full corpus — same trainer the batch q18_unigram_seg uses
    val vocab = graft.operators.TextQueries
      .trainUnigramVocab(spark, "/root/testdata/sf0.001")
    assert(vocab.nonEmpty)
    assert(vocab.count(_._1.length > 1) <= 256, "piece slice exceeds the cap")
    assert(vocab.forall(_._2 >= 0L), "negative micro-nat cost")
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val got = drive(rows)(b => CurationGates.unigramScore(b, vocab))
    // every doc scored; multi-char pieces actually fired somewhere
    // (cost below the all-chars path means the DP used a piece)
    assert(got.size == rows.length)
    // gate stats must equal the BATCH OPERATOR's sampled rows
    // (q18_unigram_seg — occurrence-level fold vs vocab-fold + join)
    val batch = graft.operators.TextQueries.q18UnigramSeg
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      assert(got(r.getAs[Long]("doc_id")) ==
        Seq(r.getAs[Long]("n_words"), r.getAs[Long]("enc_upm")),
        s"doc ${r.getAs[Long]("doc_id")} gate/batch mismatch")
    }
  }
}
