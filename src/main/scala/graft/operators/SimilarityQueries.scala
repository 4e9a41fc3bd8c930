package graft.operators

import graft.functions.SetAgg
import graft.model.Envelope
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q18 (part 1): deduplication + similarity search over `documents` and
  * `embeddings` — the training-data-pipeline operators (BASELINE.json
  * north star).
  *
  * Determinism rules that make these oracle-matchable AND
  * shuffle/AQE-proof at scale:
  *  - all hashing is md5 hex (identical in every engine); minhash is
  *    the lexicographic min of seeded md5 strings;
  *  - all float reductions go through scaled-integer fixed point
  *    (`round(x*y*1e12) → BIGINT`) so the sum is order-independent;
  *  - floats are explicitly widened to double before multiplying (a
  *    bare float*float would be single-precision in Spark but not
  *    necessarily elsewhere).
  *
  * Scale notes: minhash/simhash/LSH are single-pass explode→groupBy
  * per doc (shuffle keyed by doc_id, combinable map-side); candidate
  * pair joins are bucket-equi-joins (shuffle on band bucket), never
  * all-pairs; brute-force cosine is probes×corpus with the tiny probe
  * side broadcast.
  */
object SimilarityQueries {

  // wideRead: the q18 family is kernel-heavy (dots, DPs, digests) and
  // that work fuses into the scan stage — which on the single-row-group
  // fixtures is ONE task (no-op on well-split data; see
  // ScaleOps.wideRead)
  private def docs(spark: SparkSession, dir: String): DataFrame =
    ScaleOps.wideRead(spark, dir, "documents")

  private def embs(spark: SparkSession, dir: String): DataFrame =
    ScaleOps.wideRead(spark, dir, "embeddings")

  /** documents ∪ re-delivered copies (doc_id%10==0, shifted id) — gives
    * exact-dedup a non-trivial duplicate set to find. */
  private def withDupes(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text"))
      .union(d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

  private val withDupesSql =
    """incoming AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)"""
      .stripMargin

  // ---- exact dedup: hash-groupBy, keep lowest id ----
  val q18DedupExact: QueryDef = QueryDef(
    "q18_dedup_exact",
    s"""WITH $withDupesSql
       |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
       |       count(*) AS n_copies
       |FROM incoming
       |GROUP BY md5(text)
       |HAVING count(*) > 1
       |ORDER BY keep_id""".stripMargin) { (spark, dir) =>
    withDupes(docs(spark, dir))
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
      .orderBy(col("keep_id"))
  }

  // ---- MinHash signatures: word-3-gram shingles → 8 seeded minhashes
  //      → 4 banded buckets (LSH) ----

  /** Spark-side shingle set: word 3-grams. The size ≥ 3 guard matches
    * the oracle's range(1, len(ws)-1) (empty for short docs):
    * sequence(0, size-3) DESCENDS for size < 3 and concat_ws skips the
    * null out-of-range elements, so an unguarded form would emit
    * degenerate 1-/2-word shingles the oracle never produces. */
  private def shingled(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
          .as("shingle"))

  /** ONE corpus-wide DISTINCT (doc_id, source, shingle) 3-gram frame
    * per corpus fingerprint, shared by the operators that need the
    * materialized corpus-wide shingle set: containment's rare-shingle
    * DF index and the HLL distinct-shingle pair
    * (TextQueries.hllShingles projects (source, shingle) off this) —
    * one explode and one distinct exchange build the frame; both
    * consumers then aggregate over a parquet scan of it. Residence is
    * a fingerprinted parquet copy ([[ScaleOps.materializedDerived]]),
    * NOT a localCheckpoint: the round-13 checkpoint form pinned the
    * corpus-sized frame as deserialized block-manager blocks for the
    * rest of the session, which the round-14 solo A/B measured taxing
    * all 143 NON-consumer queries 1.23× (storage-pool pressure + GC)
    * while not even helping the three consumers at sf0.1. Two
    * deliberate NON-consumers, both measured at 60× (SCALING.md
    * round-13 note): bandIndex's minhash pass — min() is
    * duplicate-idempotent, so its explode→map-side-combine form needs
    * no distinct exchange and forcing one would add a corpus-sized
    * shuffle to the one pipeline that avoids it — and the exact
    * confirms (exactOverlap), whose |candidates|-bounded
    * docs-prune-then-explode is strictly cheaper than filtering this
    * corpus-sized frame per audit. */
  private val docShinglesCache = new SessionCache[String, DataFrame]()

  /** INVARIANT (ADVICE r19): doc_id is a key of `documents` (one row,
    * hence one source, per doc_id — FIXTURES.md schema, and every
    * oracle treats it so), therefore the distinct (doc_id, source,
    * shingle) rows here project to DISTINCT (doc_id, shingle) rows.
    * exactOverlap's small-corpus branch relies on that: it reads this
    * frame minus `source` without re-deduplicating. */
  private[graft] def docShingles(spark: SparkSession, dir: String): DataFrame =
    docShinglesCache.getOrElseUpdate(spark, dir) {
      ScaleOps.materializedDerived(spark, dir, "documents", "graft_shingles_") { d =>
        d.select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
          .where(size(col("ws")) >= 3)
          .select(col("doc_id"), col("source"), explode(expr(
            "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
            .as("shingle"))
          .distinct()
      }
    }

  /** 8 minhashes computed as WIDE aggregates in one shingle pass with
    * ONE md5 per shingle: minhash j orders shingles by the j-th 4-hex
    * slice of md5(shingle) (full hash appended as tiebreak). The 8
    * orderings share one digest, so they are approximately independent
    * 16-bit families only while shingle counts stay ≪ 2^16 (true for
    * document-sized inputs; widen the slices to 8 hex chars if
    * million-shingle documents are expected). No plane-explode (the j-exploded form shuffles 8×
    * the shingle count), fully map-side combinable — each partition
    * reduces its shingles to 8 mins before the single doc-keyed
    * exchange. Band buckets derive from the wide row with a 4-way
    * stack, no second aggregation. */
  private def minhashes(d: DataFrame): DataFrame =
    shingled(d)
      .withColumn("h", md5(col("shingle").cast("binary")))
      .groupBy(col("doc_id"))
      .agg(
        min(concat(substring(col("h"), 1, 4), col("h"))).as("h0"),
        (1 until 8).map(j =>
          min(concat(substring(col("h"), 4 * j + 1, 4), col("h"))).as(s"h$j")): _*)

  /** Band buckets from a (doc_id, h0..h7) signature frame. */
  private def bandsOf(mh: DataFrame): DataFrame =
    mh.select(col("doc_id"), expr(
      """stack(4,
        |  0, md5(concat_ws('|', h0, h1)),
        |  1, md5(concat_ws('|', h2, h3)),
        |  2, md5(concat_ws('|', h4, h5)),
        |  3, md5(concat_ws('|', h6, h7))) AS (band, bucket)""".stripMargin))

  private[graft] def bandBuckets(d: DataFrame): DataFrame =
    bandsOf(minhashes(d))

  /** Session-scoped materialization of the LSH band index per corpus:
    * the shingle→minhash→band pipeline is the expensive shared prefix
    * of FOUR operators (signatures, candidate pairs, CC clusters,
    * PageRank), and a production dedup run computes this index ONCE
    * and feeds every consumer — so the library does the same. Keyed
    * by (session, dir, corpus variant), materialized via eager
    * localCheckpoint (immutable inputs, so no invalidation); on a
    * cluster this is the persisted bucket-index table NearDupStream
    * already maintains incrementally. */
  private val bandIndexCache = new SessionCache[(String, Boolean), DataFrame]()

  /** Session-scoped minhash signature frame (doc_id, h0..h7) per
    * corpus: the shingle pass underneath [[bandIndex]], shared so the
    * estimator audit (q18_minhash_quality) reads the SAME signatures
    * the band index was built from — one shingle scan per (session,
    * corpus) however many consumers. Bands derive from this frame
    * deterministically (the stack select), so every bandIndex
    * consumer is bit-identical to the pre-cache form. */
  private val minhashCache = new SessionCache[(String, Boolean), DataFrame]()

  private def minhashIndex(spark: SparkSession, dir: String, dupes: Boolean): DataFrame =
    CacheResidence.memo("band", minhashCache, spark, (dir, dupes)) {
      val corpus = if (dupes) withDupes(docs(spark, dir)) else docs(spark, dir)
      CacheResidence.resident("band", minhashes(corpus))
    }

  private def bandIndex(spark: SparkSession, dir: String, dupes: Boolean): DataFrame =
    CacheResidence.memo("band", bandIndexCache, spark, (dir, dupes)) {
      CacheResidence.resident("band", bandsOf(minhashIndex(spark, dir, dupes)))
    }

  private val minhashSql =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |       FROM w, unnest(range(1, len(ws)-1)) AS t(i)),
      |hh AS (SELECT doc_id, md5(shingle) AS h FROM sh),
      |mh AS (SELECT doc_id,
      |         min(substr(h, 1, 4) || h) AS h0, min(substr(h, 5, 4) || h) AS h1,
      |         min(substr(h, 9, 4) || h) AS h2, min(substr(h, 13, 4) || h) AS h3,
      |         min(substr(h, 17, 4) || h) AS h4, min(substr(h, 21, 4) || h) AS h5,
      |         min(substr(h, 25, 4) || h) AS h6, min(substr(h, 29, 4) || h) AS h7
      |       FROM hh GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, band, bucket FROM (
      |    SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM mh
      |    UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM mh
      |    UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM mh
      |    UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM mh) u)""".stripMargin

  val q18MinhashSig: QueryDef = QueryDef(
    "q18_minhash_sig",
    s"""WITH $minhashSql
       |SELECT doc_id, band, bucket FROM bands
       |WHERE doc_id % 20 = 0
       |ORDER BY doc_id, band""".stripMargin) { (spark, dir) =>
    bandIndex(spark, dir, dupes = false)
      .where(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("band"), col("bucket"))
      .orderBy(col("doc_id"), col("band"))
  }

  /** Candidate pairs per (band, bucket) WITHOUT a bands self-join: group
    * each bucket's doc ids and enumerate ordered pairs bucket-locally
    * (buckets are tiny by construction — that is the point of LSH). One
    * pass over the bands pipeline instead of two full recomputations,
    * and the standard candidate-enumeration shape at corpus scale. */
  private def bucketPairs(bands: DataFrame): DataFrame =
    bands
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) > 1)
      .select(col("band"), explode(expr(
        """flatten(transform(ds,
          |  (a, i) -> transform(slice(ds, i + 2, size(ds)),
          |            b -> struct(a AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
      .select(col("band"), col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))

  /** Session-scoped DISTINCT LSH candidate-pair frame per (corpus,
    * variant) — the deduplicated (doc_a, doc_b) set every downstream
    * consumer (edit_dedup, tfidf_sim, minhash_quality, winnow-loser,
    * pagerank edges, triangles, leakage/prep_v2 edge sets) derived
    * per execution as `bucketPairs(bandIndex).select(...).distinct()`
    * (optimization round 19). The frame is duplicate-density-bounded
    * (~23k narrow rows at sf0.1), so the eager checkpoint's residency
    * is trivial while each consumer drops a bucket-group + distinct
    * exchange pair per execution. Same discipline and justification
    * as [[simhashPairCache]], which has cached the pigeonhole
    * candidate set since round 13. */
  private val candPairCache = new SessionCache[(String, Boolean), DataFrame]()

  /** q18_containment's rare-shingle candidate pairs and
    * q18_fuzzy_contam's train×eval collision pairs, session-cached on
    * the identical justification (deterministic corpus-index
    * artifacts, duplicate-density-bounded row counts). */
  private val containCandCache = new SessionCache[String, DataFrame]()
  private val fuzzyCandCache = new SessionCache[String, DataFrame]()

  private def lshCandidates(spark: SparkSession, dir: String, dupes: Boolean): DataFrame =
    CacheResidence.memo("lshcand", candPairCache, spark, (dir, dupes)) {
      val pairs = bucketPairs(bandIndex(spark, dir, dupes))
        .select(col("doc_a"), col("doc_b")).distinct()
      // residency size-gated (optimization round 20, VERDICT r19
      // follow-up 4): "duplicate-density-bounded" is a property of the
      // CORPUS, not of the frame — on a duplicate-dense corpus the
      // candidate set grows without bound and an eager localCheckpoint
      // would pin it in executor block storage for the session (the
      // round-14 residency doctrine's exact hazard). Below the shared
      // small-corpus gate the pin is trivially bounded (≤ C(n,2) narrow
      // rows, in practice ~23k at sf0.1); at scale the frame stays lazy
      // and consumers recompute from the resident band index — the
      // pre-r19 behavior the 60× tier was measured on.
      if (ScaleOps.smallCorpus(spark, dir))
        CacheResidence.resident("lshcand", pairs)
      else pairs
    }

  val q18MinhashPairs: QueryDef = QueryDef(
    "q18_minhash_pairs",
    s"""WITH $minhashSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       count(DISTINCT a.band) AS shared_bands
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    bucketPairs(bandIndex(spark, dir, dupes = false))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("band")).as("shared_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- triangle counts on the candidate graph: how CLIQUE-LIKE is
  //      each doc's dup neighborhood? A duplicate cluster is a
  //      near-clique (every member collides with every other →
  //      triangle-dense); a chain or star of incidental bucket
  //      collisions has few triangles. Per-doc triangle count is the
  //      cluster-quality signal a dedup QA pass reads next to
  //      q18_dup_stats' size histogram: high n_tri → safe transitive
  //      collapse, low n_tri on a high-degree doc → hub artifact, send
  //      to the exact confirm. Standard wedge-close counting: edges
  //      (a<b) self-join on the middle node, then a semi-check of the
  //      closing edge — cost Σ deg(mid)², bounded because every edge
  //      comes out of a guarded LSH bucket (degree ≤ Σ of a doc's four
  //      band-bucket sizes). Each triangle (a<b<c) is counted once per
  //      member. ----
  val q18Triangles: QueryDef = QueryDef(
    "q18_triangles",
    s"""WITH $minhashSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |tri AS (
       |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
       |  FROM cand e1
       |  JOIN cand e2 ON e2.doc_a = e1.doc_b
       |  JOIN cand e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
       |m AS (SELECT a AS doc_id FROM tri
       |      UNION ALL SELECT b FROM tri
       |      UNION ALL SELECT c FROM tri)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    // one edge materialization, three plan consumers (both wedge arms
    // + the closing check) → eager checkpoint like exactOverlap's
    val e = lshCandidates(spark, dir, dupes = false)
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.doc_a") === col("e1.doc_b"))
      .join(e.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"),
        "left_semi")
      .select(col("e1.doc_a").as("a"), col("e1.doc_b").as("b"), col("e2.doc_b").as("c"))
    tri.select(col("a").as("doc_id"))
      .unionAll(tri.select(col("b").as("doc_id")))
      .unionAll(tri.select(col("c").as("doc_id")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tri"))
      .orderBy(col("doc_id"))
  }

  // ---- SimHash: 32-bit signature from word votes; bit i comes from
  //      the i-th hex digit of md5(word) (high digit → +1).
  //
  //      Computed WITHOUT a word×bit explode: "digit >= 8" is the
  //      nibble's high bit, so one translate() maps the 32 hex digits of
  //      md5(word) to a 32-char 0/1 vote row, and 32 wide map-side
  //      combinable sums per doc replace the |words|·32-row shuffle of
  //      the naive formulation. Identical votes, identical signatures. ----

  /** (doc_id, sig: BIGINT, simhash: 32-char bit string) per document. */
  private def simhashSigs(d: DataFrame): DataFrame = {
    val wordBits = d
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        translate(substring(md5(col("w").cast("binary")), 1, 32),
          "0123456789abcdef", "0000000011111111").as("bits"))
    val ones = (0 until 32).map(b =>
      sum(expr(s"CAST(substring(bits, ${b + 1}, 1) AS INT)")).as(s"o$b"))
    val sigExpr = (0 until 32)
      .map(b => s"IF(2 * o$b > nw, ${1L << b}L, 0L)").mkString(" + ")
    val bitsExpr = (0 until 32)
      .map(b => s"IF(2 * o$b > nw, '1', '0')").mkString("concat(", ", ", ")")
    wordBits
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), ones: _*)
      .select(col("doc_id"), expr(sigExpr).as("sig"), expr(bitsExpr).as("simhash"))
  }

  /** (doc_id, band, bucket) simhash keys of an arbitrary
    * (doc_id, text) frame for the STREAMING gate (SimhashDupStream):
    * the same 2-of-4 block-pair blocking q18_simhash_pairs proves
    * complete for hamming ≤ 2 — band = block-pair index (0..5),
    * bucket = the pair's 16-bit effective key. A collision nominates a
    * candidate; the exact bit_count confirm stays with the batch
    * operator (the NearDupStream division of labor). */
  private[graft] def simhashBuckets(d: DataFrame): DataFrame = {
    val pairsIdx = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    val combos = pairsIdx.zipWithIndex.map { case ((j1, j2), c) =>
      struct(lit(c).as("band"),
        concat_ws(":",
          expr(s"shiftright(sig, ${8 * j1}) & 255L"),
          expr(s"shiftright(sig, ${8 * j2}) & 255L")).as("bucket"))
    }
    simhashSigs(d)
      .select(col("doc_id"), explode(array(combos: _*)).as("k"))
      .select(col("doc_id"), col("k.band").as("band"), col("k.bucket").as("bucket"))
  }

  /** Session-scoped signature table per corpus (the bandIndex
    * rationale): the word-explode + 32-wide-sum pipeline is the shared
    * prefix of q18_simhash and BOTH sides of q18_simhash_pairs'
    * pigeonhole self-join — a production near-dup run materializes the
    * signature table once and every consumer reads it. */
  private val simhashSigCache = new SessionCache[String, DataFrame]()

  private def simhashSigsCached(spark: SparkSession, dir: String): DataFrame =
    CacheResidence.memo("simhash", simhashSigCache, spark, dir) {
      CacheResidence.resident("simhash", simhashSigs(docs(spark, dir)))
    }

  /** The hamming ≤ 2 pair frame, materialized once per (session,
    * corpus): q18_simhash_pairs and q18_simhash_quality both read it,
    * and within ONE query plan a re-used reference would otherwise
    * re-run the 6-way block-pair self-join per consumer (the
    * estimator audit referenced it six times before this cache —
    * PLANS_r11.md). |pairs| is duplicate-density-sized, so the
    * checkpoint holds candidate rows, never corpus text. */
  private val simhashPairCache = new SessionCache[String, DataFrame]()

  private def simhashPairsCached(spark: SparkSession, dir: String): DataFrame =
    CacheResidence.memo("simhash", simhashPairCache, spark, dir) {
      CacheResidence.resident("simhash", simhashPairsFromSigs(
        simhashSigsCached(spark, dir).select(col("doc_id"), col("sig"))))
    }

  val q18Simhash: QueryDef = QueryDef(
    "q18_simhash",
    """WITH wrd AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |votes AS (
      |  SELECT doc_id, bit,
      |         sum(CASE WHEN strpos('89abcdef', substr(md5(w), bit + 1, 1)) > 0
      |                  THEN 1 ELSE -1 END) AS v
      |  FROM wrd, unnest(range(0, 32)) AS t(bit)
      |  GROUP BY doc_id, bit)
      |SELECT doc_id,
      |       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY bit)
      |         AS simhash
      |FROM votes
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    simhashSigsCached(spark, dir)
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))
  }

  // ---- simhash near-dup pairing, pigeonhole-blocked: for a hamming
  //      threshold of 2, the 32-bit simhash splits into THREE blocks
  //      (11/11/10 bits) — 2 flips touch at most 2 of 3 blocks, so
  //      every qualifying pair shares a block, and the wide blocks keep
  //      buckets selective (byte-sized blocks left one bucket holding
  //      65% of this corpus). Candidates come from per-(block, value)
  //      buckets — never all pairs — and the exact filter is one
  //      codegen'd bit_count(xor) <= 2 per candidate. ----
  val q18SimhashPairs: QueryDef = QueryDef(
    "q18_simhash_pairs",
    """WITH wrd AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |votes AS (
      |  SELECT doc_id, bit,
      |         sum(CASE WHEN strpos('89abcdef', substr(md5(w), bit + 1, 1)) > 0
      |                  THEN 1 ELSE -1 END) AS v
      |  FROM wrd, unnest(range(0, 32)) AS t(bit)
      |  GROUP BY doc_id, bit),
      |sigs AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN v > 0
      |                       THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
      |                       ELSE 0 END) AS BIGINT) AS sig
      |  FROM votes GROUP BY doc_id),
      |blocks AS (
      |  SELECT doc_id, j,
      |         CASE j WHEN 0 THEN sig & 2047
      |                WHEN 1 THEN (sig >> 11) & 2047
      |                ELSE (sig >> 22) & 1023 END AS blk
      |  FROM sigs, unnest(range(0, 3)) AS p(j)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM blocks a JOIN blocks b
      |    ON a.j = b.j AND a.blk = b.blk AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, bit_count(xor(sa.sig, sb.sig)) AS hamming
      |FROM cand
      |JOIN sigs sa ON sa.doc_id = doc_a
      |JOIN sigs sb ON sb.doc_id = doc_b
      |WHERE bit_count(xor(sa.sig, sb.sig)) <= 2
      |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    simhashPairsCached(spark, dir)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** All (doc_a < doc_b) pairs with hamming(sig_a, sig_b) ≤ 2, from a
    * (doc_id, sig) frame. Candidates via a distributed (block-pair,
    * values) equi-join carrying both signatures, with the exact
    * bit_count filter applied INSIDE the join's output before any
    * dedup. Blocking is 2-of-4: split the 32-bit sig into four bytes;
    * ≤2 flips corrupt at most 2 of the 4 blocks, so every qualifying
    * pair agrees on at least one of the C(4,2)=6 block PAIRS — a
    * 16-bit effective key. Single wide blocks degenerate on skewed
    * corpora (a dominant 11-bit pattern makes one bucket quadratic);
    * requiring TWO clean blocks keeps buckets selective for 6 explode
    * rows per doc instead of 3. Any complete blocking yields the same
    * final hamming≤2 pair set (completeness is property-tested against
    * brute force in SimhashBlockingSpec). Survivors stream through the
    * codegen filter — only ~|survivors| rows reach the distinct. */
  private[operators] def simhashPairsFromSigs(sigs: DataFrame): DataFrame = {
    val pairsIdx = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    val combos = pairsIdx.zipWithIndex.map { case ((j1, j2), c) =>
      struct(lit(c).as("c"),
        expr(s"shiftright(sig, ${8 * j1}) & 255L").as("v1"),
        expr(s"shiftright(sig, ${8 * j2}) & 255L").as("v2"))
    }
    val blocks = sigs
      .select(col("doc_id"), col("sig"), explode(array(combos: _*)).as("k"))
      .select(col("doc_id"), col("sig"),
        col("k.c").as("c"), col("k.v1").as("v1"), col("k.v2").as("v2"))
    val a = blocks.select(col("c"), col("v1"), col("v2"),
      col("doc_id").as("doc_a"), col("sig").as("sa"))
    val b = blocks.select(col("c"), col("v1"), col("v2"),
      col("doc_id").as("doc_b"), col("sig").as("sb"))
    a.join(b, Seq("c", "v1", "v2"))
      .where(col("doc_a") < col("doc_b") && expr("bit_count(sa ^ sb)") <= 2)
      .select(col("doc_a"), col("doc_b"), expr("bit_count(sa ^ sb)").as("hamming"))
      .distinct()
  }

  // ---- n-gram Jaccard on a probe subset (all pairs of doc_id < 30) ----
  val q18NgramJaccard: QueryDef = QueryDef(
    "q18_ngram_jaccard",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |           WHERE doc_id < 30),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |       FROM w, unnest(range(1, len(ws)-1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS both_n
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b, both_n,
      |       CAST(both_n AS DOUBLE) / (sa.sz + sb.sz - both_n) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    val sh = shingled(docs(spark, dir).where(col("doc_id") < 30)).distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("both_n"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("both_n"),
        (col("both_n").cast("double") / (col("sz_a") + col("sz_b") - col("both_n")))
          .as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- quantized-integer vector kernels (the engine's embedding math)
  //
  // Each vector is fixed-pointed ONCE (round(x·1e6) → BIGINT array);
  // every pair dot product is then pure integer multiply-add through the
  // codegen'd VectorMath.DotLongArrays expression — order-independent,
  // bit-identical across engines, and ~100× cheaper than per-pair
  // float-round formulations (no per-element rounding in the hot loop,
  // no exploded dims self-join holding |pairs|·dim intermediate rows).

  /** vec_id, label, q (quantized vector), n2 (integer self-dot). */
  private def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("label"),
      graft.functions.VectorMath.quantize(col("embedding")).as("q"))
      .withColumn("n2", graft.functions.VectorMath.dotLong(col("q"), col("q")))

  private def dotQ(a: String, b: String): Column =
    graft.functions.VectorMath.dotLong(col(a), col(b))

  /** The static IVF serving index: (qn (vec_id, label, q), cent
    * (c_label, d, cx)) — the EXACT frames q18_ann_ivf routes and
    * scores with, exposed for the streaming AnnServeGate so
    * serve-time routing/scoring cannot drift from the audited batch
    * query. */
  private[graft] def ivfIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    ivfIndexOf(embs(spark, dir))

  /** [[ivfIndex]] over an arbitrary (vec_id, label, embedding) frame —
    * the refresh path (streaming.AnnIndexStore) re-runs the SAME
    * quantize/centroid expressions on base+delta so a refreshed index
    * cannot drift from a cold rebuild. */
  private[graft] def ivfIndexOf(e: DataFrame): (DataFrame, DataFrame) = {
    val qn = quantized(e)
    val cent = qn
      .select(col("vec_id"), col("label"), posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(expr("CAST(round(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)").as("cx"))
      .select(col("label").as("c_label"), col("d"), col("cx"))
    (qn.select(col("vec_id"), col("label"), col("q")), cent)
  }

  /** DuckDB twin of the quantized pipeline (1-based list indexing). */
  private val quantSql =
    """quant AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding,
      |           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q
      |  FROM embeddings),
      |qn AS (
      |  SELECT vec_id, label, q,
      |         CAST(list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i]))
      |              AS BIGINT) AS n2
      |  FROM quant)""".stripMargin

  private def dotQSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
       |     AS BIGINT)""".stripMargin

  // ---- brute-force cosine top-k (ANN baseline): tiny probe side
  //      broadcast against the full corpus, one codegen dot per pair ----
  val q18CosineTopK: QueryDef = QueryDef(
    "q18_cosine_topk",
    s"""WITH $quantSql,
       |scored AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |         CAST(${dotQSql("p.q", "c.q")} AS DOUBLE)
       |           / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cosine
       |  FROM qn p JOIN qn c ON p.vec_id < 5 AND p.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT probe_id, cand_id, cosine,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM scored)
       |SELECT probe_id, cand_id, cosine, rnk FROM ranked
       |WHERE rnk <= 3
       |ORDER BY probe_id, rnk""".stripMargin) { (spark, dir) =>
    val qn = quantized(embs(spark, dir))
    val probes = qn.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q").as("qp"), col("n2").as("n2_p"))
    val cands = qn
      .select(col("vec_id").as("cand_id"), col("q").as("qc"), col("n2").as("n2_c"))
    val cosine = dotQ("qp", "qc").cast("double") /
      (sqrt(col("n2_p").cast("double")) * sqrt(col("n2_c").cast("double")))
    val byProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    broadcast(probes).join(cands, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"), cosine.as("cosine"))
      .withColumn("rnk", row_number().over(byProbe))
      .where(col("rnk") <= 3)
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ---- kNN label classification (embedding-quality eval): hold out
  //      every 10th vector UNDER id 2000 as a probe (a FIXED eval
  //      sample — the id cap keeps the probe count bounded as the
  //      corpus grows, so cost is one corpus scan per eval, never
  //      |corpus|²/10), predict its label by majority vote of its 5
  //      nearest train vectors (cosine; ties → lower cand_id, vote
  //      ties → lower label), report per-label accuracy.
  //      The number an embedding-pipeline owner watches before
  //      trusting semantic dedup / clustering built on those vectors.
  //      Scale: the probe side is a bounded broadcast (an eval sample,
  //      not the corpus) against one full scan + per-probe TakeOrdered
  //      — the same shape as q18_cosine_topk; swap in the IVF probe
  //      join (q18_ann_ivf) when the eval set outgrows broadcast. ----
  val q18KnnClassify: QueryDef = QueryDef(
    "q18_knn_classify",
    s"""WITH $quantSql,
       |sc AS (
       |  SELECT p.vec_id AS probe_id, p.label AS plabel,
       |         c.vec_id AS cand_id, c.label AS clabel,
       |         CAST(${dotQSql("p.q", "c.q")} AS DOUBLE)
       |           / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cosine
       |  FROM qn p JOIN qn c
       |    ON p.vec_id % 10 = 0 AND p.vec_id < 2000
       |   AND NOT (c.vec_id % 10 = 0 AND c.vec_id < 2000)),
       |rk AS (
       |  SELECT probe_id, plabel, clabel,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM sc),
       |vt AS (SELECT probe_id, plabel, clabel, count(*) AS cnt
       |       FROM rk WHERE rnk <= 5 GROUP BY 1, 2, 3),
       |pr AS (
       |  SELECT probe_id, plabel, clabel AS pred,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cnt DESC, clabel) AS rr
       |  FROM vt)
       |SELECT CAST(plabel AS BIGINT) AS label,
       |       CAST(count(*) AS BIGINT) AS n_probes,
       |       CAST(sum(CASE WHEN pred = plabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |       CAST(10000 * sum(CASE WHEN pred = plabel THEN 1 ELSE 0 END)
       |            // count(*) AS BIGINT) AS acc_bp
       |FROM pr WHERE rr = 1
       |GROUP BY plabel ORDER BY label""".stripMargin) { (spark, dir) =>
    val qn = quantized(embs(spark, dir))
    val isProbe = col("vec_id") % 10 === 0 && col("vec_id") < 2000
    val probes = qn.where(isProbe)
      .select(col("vec_id").as("probe_id"), col("label").as("plabel"),
        col("q").as("qp"), col("n2").as("n2_p"))
    val cands = qn.where(!isProbe)
      .select(col("vec_id").as("cand_id"), col("label").as("clabel"),
        col("q").as("qc"), col("n2").as("n2_c"))
    val cosine = dotQ("qp", "qc").cast("double") /
      (sqrt(col("n2_p").cast("double")) * sqrt(col("n2_c").cast("double")))
    val byProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    val votes = broadcast(probes).join(cands, lit(true))
      .select(col("probe_id"), col("plabel"), col("cand_id"), col("clabel"),
        cosine.as("cosine"))
      .withColumn("rnk", row_number().over(byProbe))
      .where(col("rnk") <= 5)
      .groupBy(col("probe_id"), col("plabel"), col("clabel"))
      .agg(count(lit(1)).as("cnt"))
    val byVotes = Window.partitionBy(col("probe_id"))
      .orderBy(col("cnt").desc, col("clabel"))
    votes
      .withColumn("rr", row_number().over(byVotes))
      .where(col("rr") === 1)
      .groupBy(col("plabel"))
      .agg(count(lit(1)).cast("long").as("n_probes"),
        sum(when(col("clabel") === col("plabel"), 1L).otherwise(0L)).cast("long")
          .as("n_correct"))
      .select(col("plabel").cast("long").as("label"), col("n_probes"), col("n_correct"),
        expr("(10000 * n_correct) div n_probes").as("acc_bp"))
      .orderBy(col("label"))
  }

  // ---- LSH-bucketed ANN (the scale path): 16 deterministic random
  //      hyperplanes; sign bits → bucket; search within bucket only ----

  /** ±1 hyperplane weight for (plane j, dim d), derived from md5 — the
    * same "seeded randomness" both engines can compute. */
  private val lshBitsSql =
    """sig AS (
      |  SELECT vec_id,
      |         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
      |  FROM (
      |    SELECT vec_id, j,
      |           sum(CASE WHEN strpos('89abcdef', substr(md5(j || ':' || (i-1)), 1, 1)) > 0
      |                    THEN CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
      |                    ELSE -CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
      |               END) AS s
      |    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i),
      |         unnest(range(0, 16)) AS p(j)
      |    GROUP BY vec_id, j) v
      |  GROUP BY vec_id)""".stripMargin

  /** ±1 hyperplane weights for (plane j, dim d): md5-derived exactly as
    * the oracle computes them, but materialized ONCE on the driver
    * (16 planes × 256 dims) and broadcast — the per-row formulation
    * recomputed the same 1024 md5 values 2M times at sf0.1. */
  private def lshWeights(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = for (j <- 0 until 16; d <- 0 until 256) yield {
      val hex = md.digest(s"$j:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (j, d, if ("89abcdef".contains(hex.charAt(0))) 1L else -1L)
    }
    rows.toDF("j", "d", "sign")
  }

  private[graft] def lshSig(spark: SparkSession, e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(graft.functions.VectorMath.quantize(col("embedding")))
        .as(Seq("d", "xq")))
      .join(broadcast(lshWeights(spark)), Seq("d"))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("sign") * col("xq")).as("s"))
      .groupBy(col("vec_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(j, IF(s > 0, '1', '0') AS c))), x -> x.c), '')")
        .as("bucket"))

  val q18AnnLsh: QueryDef = QueryDef(
    "q18_ann_lsh",
    s"""WITH $lshBitsSql
       |SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
       |FROM sig
       |GROUP BY bucket
       |HAVING count(*) > 1
       |ORDER BY bucket""".stripMargin) { (spark, dir) =>
    lshSig(spark, embs(spark, dir))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
      .where(col("n_vecs") > 1)
      .orderBy(col("bucket"))
  }

  // ---- IVF-style ANN: partition the corpus into clusters (here the
  //      label column stands in for a k-means assignment), precompute
  //      scaled-integer centroids, route each probe to its nearest
  //      centroid, search only that cluster. At 100 TB this turns a
  //      full-corpus scan per probe into |cluster| work, and both
  //      phases are plain joins/aggregations. ----
  val q18AnnIvf: QueryDef = QueryDef(
    "q18_ann_ivf",
    s"""WITH $quantSql,
       |dims AS (
       |  SELECT vec_id, label, i - 1 AS d, q[i] AS x
       |  FROM quant, unnest(range(1, len(q) + 1)) AS t(i)),
       |cent AS (
       |  SELECT label, d,
       |         CAST(round(CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cx
       |  FROM dims GROUP BY label, d),
       |probe_dist AS (
       |  SELECT p.vec_id, c.label,
       |         CAST(sum((p.x - c.cx) * (p.x - c.cx)) AS BIGINT) AS dist2
       |  FROM dims p JOIN cent c ON p.d = c.d
       |  WHERE p.vec_id < 5
       |  GROUP BY p.vec_id, c.label),
       |routed AS (
       |  SELECT vec_id AS probe_id, label AS probe_label FROM (
       |    SELECT vec_id, label,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist2, label) AS rn
       |    FROM probe_dist) r WHERE rn = 1),
       |pairs AS (
       |  SELECT r.probe_id, r.probe_label, c.vec_id AS cand_id,
       |         ${dotQSql("p.q", "c.q")} AS dot_s
       |  FROM routed r
       |  JOIN qn p ON p.vec_id = r.probe_id
       |  JOIN qn c ON c.label = r.probe_label AND c.vec_id <> r.probe_id)
       |SELECT probe_id, probe_label, cand_id, dot_s, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |                               ORDER BY dot_s DESC, cand_id) AS rnk
       |  FROM pairs) f
       |WHERE rnk <= 3
       |ORDER BY probe_id, rnk""".stripMargin) { (spark, dir) =>
    val qn = quantized(embs(spark, dir))
    val dims = qn
      .select(col("vec_id"), col("label"), posexplode(col("q")).as(Seq("d", "x")))
    val cent = ScaleOps.cachedCentroids(spark, dir, "ivf-cent-dim-round")(
      dims.groupBy(col("label"), col("d"))
        .agg(expr("CAST(round(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)").as("cx"))
        .select(col("label").as("c_label"), col("d"), col("cx")))
    val probeDist = dims.where(col("vec_id") < 5)
      .join(broadcast(cent), Seq("d"))
      .groupBy(col("vec_id"), col("c_label"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).cast("long").as("dist2"))
    val byProbe = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("c_label"))
    val routed = probeDist.withColumn("rn", row_number().over(byProbe))
      .where(col("rn") === 1)
      .select(col("vec_id").as("probe_id"), col("c_label").as("probe_label"))
    val probes = qn.select(col("vec_id").as("probe_id"), col("q").as("qp"))
    val cands = qn.select(col("vec_id").as("cand_id"), col("label").as("probe_label"),
      col("q").as("qc"))
    val rankW = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot_s").desc, col("cand_id"))
    broadcast(routed)
      .join(probes, Seq("probe_id"))
      .join(cands, Seq("probe_label"))
      .where(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("probe_label"), col("cand_id"),
        dotQ("qp", "qc").as("dot_s"))
      .withColumn("rnk", row_number().over(rankW))
      .where(col("rnk") <= 3)
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ---- contrastive triplet mining: for every anchor vector, its
  //      most-similar (hardest positive) and least-similar (hardest
  //      in-cluster negative) block-mate by exact integer dot — the
  //      dataset-construction op behind contrastive embedding-model
  //      training. Pairs stay inside the label block (|block|² per
  //      block, the K ∝ n knob as everywhere), both argmaxes are
  //      windows PARTITIONED by anchor riding the pair join's own
  //      partitioning, ties break on candidate id. ----
  val q18Triplets: QueryDef = QueryDef(
    "q18_triplets",
    s"""WITH $quantSql,
       |p AS (
       |  SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
       |         ${dotQSql("a.q", "b.q")} AS dot_s
       |  FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id <> b.vec_id),
       |r AS (
       |  SELECT anchor_id, cand_id, dot_s,
       |         row_number() OVER (PARTITION BY anchor_id
       |                            ORDER BY dot_s DESC, cand_id) AS rp,
       |         row_number() OVER (PARTITION BY anchor_id
       |                            ORDER BY dot_s ASC, cand_id) AS rn
       |  FROM p)
       |SELECT anchor_id,
       |       CAST(max(CASE WHEN rp = 1 THEN cand_id END) AS BIGINT) AS pos_id,
       |       CAST(max(CASE WHEN rp = 1 THEN dot_s END) AS BIGINT) AS pos_dot,
       |       CAST(max(CASE WHEN rn = 1 THEN cand_id END) AS BIGINT) AS neg_id,
       |       CAST(max(CASE WHEN rn = 1 THEN dot_s END) AS BIGINT) AS neg_dot
       |FROM r GROUP BY anchor_id
       |ORDER BY anchor_id""".stripMargin) { (spark, dir) =>
    val qn = ScaleOps.guardBlockSize(quantized(embs(spark, dir)), "label",
      "q18_triplets pair join")
    val a = qn.select(col("label"), col("vec_id").as("anchor_id"), col("q").as("qa"))
    val b = qn.select(col("label"), col("vec_id").as("cand_id"), col("q").as("qb"))
    val pairs = a.join(b, Seq("label"))
      .where(col("anchor_id") =!= col("cand_id"))
      .select(col("anchor_id"), col("cand_id"), dotQ("qa", "qb").as("dot_s"))
    val byP = Window.partitionBy(col("anchor_id")).orderBy(col("dot_s").desc, col("cand_id"))
    val byN = Window.partitionBy(col("anchor_id")).orderBy(col("dot_s").asc, col("cand_id"))
    pairs
      .withColumn("rp", row_number().over(byP))
      .withColumn("rn", row_number().over(byN))
      .where(col("rp") === 1 || col("rn") === 1)
      .groupBy(col("anchor_id"))
      .agg(max(when(col("rp") === 1, col("cand_id"))).cast("long").as("pos_id"),
        max(when(col("rp") === 1, col("dot_s"))).cast("long").as("pos_dot"),
        max(when(col("rn") === 1, col("cand_id"))).cast("long").as("neg_id"),
        max(when(col("rn") === 1, col("dot_s"))).cast("long").as("neg_dot"))
      .orderBy(col("anchor_id"))
  }

  // ---- n-gram novelty: the dedup-adjacent quality signal — what
  //      fraction of a document's word 3-grams appears in NO other
  //      document. High novelty = unique content; low novelty = boiler-
  //      plate / near-dup tail that slipped past exact dedup. One gram
  //      pass: distinct (doc, gram), gram-keyed document counts, probe
  //      docs join back (gram-keyed shuffle, volume linear in distinct
  //      grams). Integer permille; probes bounded to doc_id % 20. ----
  val q18Novelty: QueryDef = QueryDef(
    "q18_novelty",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |             md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS s
      |      FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
      |      WHERE len(ws) >= 3),
      |gd AS (SELECT s, CAST(count(*) AS BIGINT) AS nd FROM g GROUP BY s)
      |SELECT g.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_grams,
      |       CAST(count(CASE WHEN gd.nd = 1 THEN 1 END) AS BIGINT) AS n_unique,
      |       (1000 * CAST(count(CASE WHEN gd.nd = 1 THEN 1 END) AS BIGINT))
      |         // CAST(count(*) AS BIGINT) AS novelty_permille
      |FROM g JOIN gd USING (s)
      |WHERE g.doc_id % 20 = 0
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin) { (spark, dir) =>
    val g = docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      // Spark's sequence(0, n) DESCENDS for n < 0 — guard short docs
      .where(size(col("ws")) >= 3)
      // digest the gram BEFORE the distinct/join: fixed 32-char keys
      // shuffle and hash-join far cheaper than raw 30-60 char grams,
      // and counts-by-digest equal counts-by-gram (md5 is the same
      // collision-free identity every dedup op here already keys on)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-3), i -> md5(CAST(concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS BINARY)))"))
        .as("s"))
      .distinct()
    val gd = g.groupBy(col("s")).agg(count(lit(1)).as("nd"))
    g.where(col("doc_id") % 20 === 0)
      .join(gd, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("nd") === 1, 1)).as("n_unique"))
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        expr("(1000 * n_unique) div n_grams").as("novelty_permille"))
      .orderBy(col("doc_id"))
  }

  // ---- IVF-PQ with ADC re-rank: the standard production ANN stack,
  //      composing the two halves above — IVF routing (q18_ann_ivf)
  //      picks the probe's cluster, PQ codes (q18_pq_encode's encoding)
  //      compress every candidate to 8 bytes, and the probe scores
  //      candidates via Asymmetric Distance Computation: a per-probe
  //      lookup table ld[s][codeword] = ‖probe_s − c_{codeword,s}‖²
  //      (|probes|·K·8 integer rows, broadcast) summed over the
  //      candidate's CODES — the scoring phase touches no full vectors.
  //      The ADC top-8 shortlist is then re-ranked by the exact integer
  //      L2 on the quantized vectors. At 100 TB: codes are 8 longs per
  //      vector (vs 64) and would live as a precomputed table (here the
  //      encode runs in-query off the ONE centroid broadcast, as in
  //      q18_pq_encode); per-probe work = |cluster|·8 code lookups +
  //      8 exact dots. Every window keys on a probe or (vec, sub) —
  //      nothing global. ----
  val q18AnnIvfPq: QueryDef = QueryDef(
    "q18_ann_ivfpq",
    s"""WITH $quantSql,
       |u AS (
       |  SELECT vec_id, label, i AS dim, q[i] AS qi
       |  FROM quant, unnest(range(1, len(q) + 1)) AS t(i)),
       |c AS (
       |  SELECT label AS cl, dim, CAST(sum(qi) AS BIGINT) // count(*) AS mq
       |  FROM u GROUP BY label, dim),
       |sd AS (
       |  SELECT u.vec_id, u.label, c.cl, (u.dim - 1) // 8 AS s,
       |         CAST(sum((u.qi - c.mq) * (u.qi - c.mq)) AS BIGINT) AS dist
       |  FROM u JOIN c ON u.dim = c.dim
       |  GROUP BY u.vec_id, u.label, c.cl, (u.dim - 1) // 8),
       |codes AS (
       |  SELECT vec_id, label, s, cl AS code FROM (
       |    SELECT vec_id, label, s, cl,
       |           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cl) AS rnk
       |    FROM sd) z
       |  WHERE rnk = 1),
       |rt AS (
       |  SELECT vec_id, cl, CAST(sum(dist) AS BIGINT) AS fdist
       |  FROM sd WHERE vec_id < 5 GROUP BY vec_id, cl),
       |routed AS (
       |  SELECT vec_id AS probe_id, cl AS probe_label FROM (
       |    SELECT vec_id, cl,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY fdist, cl) AS rn
       |    FROM rt) z
       |  WHERE rn = 1),
       |lut AS (
       |  SELECT vec_id AS probe_id, cl, s, dist AS ld FROM sd WHERE vec_id < 5),
       |adc AS (
       |  SELECT r.probe_id, k.vec_id AS cand_id, CAST(sum(l.ld) AS BIGINT) AS adc_d
       |  FROM routed r
       |  JOIN codes k ON k.label = r.probe_label AND k.vec_id <> r.probe_id
       |  JOIN lut l ON l.probe_id = r.probe_id AND l.s = k.s AND l.cl = k.code
       |  GROUP BY r.probe_id, k.vec_id),
       |short AS (
       |  SELECT probe_id, cand_id, adc_d FROM (
       |    SELECT probe_id, cand_id, adc_d,
       |           row_number() OVER (PARTITION BY probe_id ORDER BY adc_d, cand_id) AS arnk
       |    FROM adc) z
       |  WHERE arnk <= 8),
       |rer AS (
       |  SELECT sh.probe_id, sh.cand_id, sh.adc_d,
       |         CAST(p.n2 - 2 * ${dotQSql("p.q", "cc.q")} + cc.n2 AS BIGINT) AS dist2
       |  FROM short sh JOIN qn p ON p.vec_id = sh.probe_id
       |                JOIN qn cc ON cc.vec_id = sh.cand_id)
       |SELECT probe_id, cand_id, adc_d, dist2, rnk FROM (
       |  SELECT rer.*, row_number() OVER (PARTITION BY probe_id
       |                                   ORDER BY dist2, cand_id) AS rnk
       |  FROM rer) f
       |WHERE rnk <= 3
       |ORDER BY probe_id, rnk""".stripMargin) { (spark, dir) =>
    import graft.functions.VectorMath
    val qn = quantized(embs(spark, dir))
    // per-label mean codeword as a 64-long array — the one broadcast
    // that routing, encoding, and the ADC lookup table all reuse
    // (session-cached, SHARED builder — ScaleOps.labelMeanCentroids:
    // q18_pq_encode consumes the same kind through the same code, so
    // the equivalence is enforced by construction, ADVICE r19)
    val cent = ScaleOps.labelMeanCentroids(spark, dir)
    // probe side: per (probe, codeword) all 8 subvector ‖q_s − c_s‖²
    // via the ranged zero-allocation codegen kernel (VectorMath
    // .subDist2) — the LUT needs every (probe, cl, s, dist) row and the
    // probe set is tiny by construction, so 5·K declarative rows is the
    // right shape here
    def d(s: Int) =
      VectorMath.subDist2(col("q"), col("c"), 8 * s, 8).as(s"d$s")
    val wide = qn.where(col("vec_id") < 5).crossJoin(broadcast(cent))
      .select(Seq(col("vec_id"), col("label"), col("cl")) ++ (0 until 8).map(d): _*)
    // corpus-side encode: the driver-resident codebook + one fused
    // argmin loop per vector (VectorMath.NearestCodes) — n rows in, 8·n
    // narrow (s, code) rows out. The former crossJoin + per-(vec, sub)
    // argmin aggregation materialized n·K wide rows and paid a
    // SortAggregate (struct-min has no mutable agg buffer); this is the
    // production encode shape — PQ codes are a per-row map of the
    // vector against a K-bounded codebook
    val (flat, cls) = ScaleOps.cachedCodebook(spark, dir, "label-mean")(
      VectorMath.collectCodebook(cent, "cl", "c"))
    val codes = qn
      .select(col("vec_id").as("cand_id"), col("label"),
        VectorMath.nearestCodes(col("q"), flat, cls, 8,
          flat.length / cls.length / 8).as("nc"))
      .select(col("cand_id"), col("label"), expr(
        "stack(8, " + (0 until 8).map(s => s"${s}L, nc[${2 * s}]").mkString(", ") +
          ") AS (s, code)"))
    val pstack = wide
      .select(col("vec_id"), col("cl"), expr(
        "stack(8, " + (0 until 8).map(s => s"${s}L, d$s").mkString(", ") + ") AS (s, dist)"))
    val lut = pstack.select(col("vec_id").as("probe_id"), col("cl"), col("s"),
      col("dist").as("ld"))
    val byProbe = Window.partitionBy(col("vec_id")).orderBy(col("fdist"), col("cl"))
    val routed = pstack.groupBy(col("vec_id"), col("cl"))
      .agg(sum(col("dist")).cast("long").as("fdist"))
      .withColumn("rn", row_number().over(byProbe))
      .where(col("rn") === 1)
      .select(col("vec_id").as("probe_id"), col("cl").as("probe_label"))
    // ADC: codes-only scoring — no q arrays flow through this join
    val adc = broadcast(routed)
      .join(codes, col("label") === col("probe_label") && col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"), col("s"), col("code").as("cl"))
      .join(broadcast(lut), Seq("probe_id", "s", "cl"))
      .groupBy(col("probe_id"), col("cand_id"))
      .agg(sum(col("ld")).cast("long").as("adc_d"))
    val byAdc = Window.partitionBy(col("probe_id")).orderBy(col("adc_d"), col("cand_id"))
    val short = adc.withColumn("arnk", row_number().over(byAdc))
      .where(col("arnk") <= 8)
      .select(col("probe_id"), col("cand_id"), col("adc_d"))
    val p = qn.select(col("vec_id").as("probe_id"), col("q").as("qp"), col("n2").as("n2p"))
    val cq = qn.select(col("vec_id").as("cand_id"), col("q").as("qc"), col("n2").as("n2c"))
    val byExact = Window.partitionBy(col("probe_id")).orderBy(col("dist2"), col("cand_id"))
    short.join(p, Seq("probe_id")).join(cq, Seq("cand_id"))
      .select(col("probe_id"), col("cand_id"), col("adc_d"),
        (col("n2p") - lit(2L) * dotQ("qp", "qc") + col("n2c")).cast("long").as("dist2"))
      .withColumn("rnk", row_number().over(byExact))
      .where(col("rnk") <= 3)
      .select(col("probe_id"), col("cand_id"), col("adc_d"), col("dist2"), col("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ---- embedding-cosine near-dup dedup, label-blocked: candidate
  //      pairs are generated only within a cluster block (the IVF
  //      partitioning), then the quantized cosine threshold collapses
  //      each pair to the lower vec_id. One broadcast pair-join on the
  //      block key + one codegen'd integer dot per pair — the plan holds
  //      |pairs| rows, never |pairs|·dim (the exploded-dims formulation
  //      this replaces shuffled 25M intermediate rows at sf0.1). ----
  val q18DedupEmbed: QueryDef = QueryDef(
    "q18_dedup_embed",
    s"""WITH $quantSql,
       |pairs AS (
       |  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
       |         ${dotQSql("a.q", "b.q")} AS dot_s,
       |         a.n2 AS n2_a, b.n2 AS n2_b
       |  FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT keep_id, dup_id,
       |       CAST(dot_s AS DOUBLE)
       |         / (sqrt(CAST(n2_a AS DOUBLE)) * sqrt(CAST(n2_b AS DOUBLE))) AS cosine
       |FROM pairs
       |WHERE CAST(dot_s AS DOUBLE)
       |        / (sqrt(CAST(n2_a AS DOUBLE)) * sqrt(CAST(n2_b AS DOUBLE))) > 0.35
       |ORDER BY keep_id, dup_id""".stripMargin) { (spark, dir) =>
    nearDupPairs(spark, dir)
      .orderBy(col("keep_id"), col("dup_id"))
  }

  /** Label-blocked near-dup pairs above the cosine threshold
    * (keep_id, dup_id, cosine) — the shared core of q18_dedup_embed and
    * q18_dedup_resolve. */
  private def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val qn = ScaleOps.guardBlockSize(quantized(embs(spark, dir)), "label",
      "q18_dedup_embed pair join")
    val a = qn.select(col("label"), col("vec_id").as("keep_id"),
      col("q").as("qa"), col("n2").as("n2_a"))
    val b = qn.select(col("label"), col("vec_id").as("dup_id"),
      col("q").as("qb"), col("n2").as("n2_b"))
    val cosine = col("dot_s").cast("double") /
      (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double")))
    // No broadcast hint: the label block key is the IVF partitioning, so
    // a shuffle join on it scales to any corpus size; at bench SF the
    // planner's size estimate picks broadcast on its own.
    a.join(b, Seq("label"))
      .where(col("keep_id") < col("dup_id"))
      .select(col("keep_id"), col("dup_id"), dotQ("qa", "qb").as("dot_s"),
        col("n2_a"), col("n2_b"))
      .select(col("keep_id"), col("dup_id"), cosine.as("cosine"))
      .where(col("cosine") > 0.35)
  }

  // ---- dedup resolution: the survivor set after near-dup collapse —
  //      any vector with a smaller-id near-duplicate is dropped (the
  //      greedy keep-lowest rule), reported per cluster block. The drop
  //      set is an anti-join, so the full corpus never re-materializes
  //      through the pair join. ----
  val q18DedupResolve: QueryDef = QueryDef(
    "q18_dedup_resolve",
    s"""WITH $quantSql,
       |pairs AS (
       |  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
       |         ${dotQSql("a.q", "b.q")} AS dot_s,
       |         a.n2 AS n2_a, b.n2 AS n2_b
       |  FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id < b.vec_id),
       |dups AS (
       |  SELECT DISTINCT dup_id FROM pairs
       |  WHERE CAST(dot_s AS DOUBLE)
       |          / (sqrt(CAST(n2_a AS DOUBLE)) * sqrt(CAST(n2_b AS DOUBLE))) > 0.35)
       |SELECT e.label, count(*) AS n_total,
       |       count(CASE WHEN d.dup_id IS NULL THEN 1 END) AS n_kept
       |FROM embeddings e LEFT JOIN dups d ON e.vec_id = d.dup_id
       |GROUP BY e.label
       |ORDER BY e.label""".stripMargin) { (spark, dir) =>
    val dups = nearDupPairs(spark, dir).select(col("dup_id")).distinct()
    embs(spark, dir)
      .join(broadcast(dups), col("vec_id") === col("dup_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("dup_id").isNull, 1)).as("n_kept"))
      .orderBy(col("label"))
  }

  // ---- the full cleaning pipeline, composed: quality filter → exact
  //      dedup (hash-groupBy, keep lowest id) → minhash-LSH near-dup
  //      drop — per-source survivor counts at every stage. This is the
  //      shape a training-data run takes at 100 TB: every stage is a
  //      hash shuffle on doc identity or bucket, no stage re-reads the
  //      corpus, and the near-dup candidate set comes from band buckets,
  //      never all pairs. ----
  private[operators] val stopWords = Seq("the", "a", "of", "and", "to", "in", "is")
  private[operators] def stopList = stopWords.map(w => s"'$w'").mkString("(", ", ", ")")

  val q18CleanCorpus: QueryDef = QueryDef(
    "q18_clean_corpus",
    s"""WITH corpus AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 10 = 0),
       |feat AS (
       |  SELECT doc_id, text, source,
       |         len(string_split(text, ' ')) AS n_words,
       |         length(text) AS n_chars,
       |         len(list_filter(string_split(text, ' '), w -> w IN $stopList)) AS n_stop,
       |         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
       |  FROM corpus),
       |flags AS (
       |  SELECT *, (n_words >= 20 AND CAST(n_stop AS DOUBLE) / n_words >= 0.01
       |             AND CAST(n_digit AS DOUBLE) / n_chars < 0.3) AS q_pass
       |  FROM feat),
       |ek AS (
       |  SELECT *, (q_pass AND doc_id = min(CASE WHEN q_pass THEN doc_id END)
       |                         OVER (PARTITION BY md5(text))) AS e_keep
       |  FROM flags),
       |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM ek WHERE e_keep),
       |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM w, unnest(range(1, len(ws)-1)) AS t(i)),
       |hh AS (SELECT doc_id, md5(shingle) AS h FROM sh),
       |mh AS (SELECT doc_id,
       |         min(substr(h, 1, 4) || h) AS h0, min(substr(h, 5, 4) || h) AS h1,
       |         min(substr(h, 9, 4) || h) AS h2, min(substr(h, 13, 4) || h) AS h3,
       |         min(substr(h, 17, 4) || h) AS h4, min(substr(h, 21, 4) || h) AS h5,
       |         min(substr(h, 25, 4) || h) AS h6, min(substr(h, 29, 4) || h) AS h7
       |       FROM hh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, band, bucket FROM (
       |    SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM mh
       |    UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM mh
       |    UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM mh
       |    UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM mh) u),
       |nd AS (
       |  SELECT DISTINCT b.doc_id AS dup_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT source,
       |       count(*) AS n_docs,
       |       count(CASE WHEN q_pass THEN 1 END) AS n_quality,
       |       count(CASE WHEN e_keep THEN 1 END) AS n_after_exact,
       |       count(CASE WHEN e_keep AND nd.dup_id IS NULL THEN 1 END) AS n_after_near
       |FROM ek LEFT JOIN nd ON ek.doc_id = nd.dup_id
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    val d = docs(spark, dir).select(col("doc_id"), col("text"), col("source"))
    val corpus = d.union(d.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source")))
    val nStop = expr(s"size(filter(split(text, ' '), w -> w IN $stopList))")
    val flags = corpus
      .withColumn("n_words", size(split(col("text"), " ")))
      .withColumn("n_chars", length(col("text")))
      .withColumn("n_stop", nStop)
      .withColumn("n_digit",
        length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
      .withColumn("q_pass", col("n_words") >= 20 &&
        col("n_stop").cast("double") / col("n_words") >= 0.01 &&
        col("n_digit").cast("double") / col("n_chars") < 0.3)
    val byHash = Window.partitionBy(md5(col("text").cast("binary")))
    val ek = flags.withColumn("e_keep",
      col("q_pass") &&
        col("doc_id") === min(when(col("q_pass"), col("doc_id"))).over(byHash))
    val bands = bandBuckets(ek.where(col("e_keep")).select(col("doc_id"), col("text")))
    val nd = bucketPairs(bands).select(col("doc_b").as("dup_id")).distinct()
    ek.join(nd, ek("doc_id") === nd("dup_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("q_pass"), 1)).as("n_quality"),
        count(when(col("e_keep"), 1)).as("n_after_exact"),
        count(when(col("e_keep") && col("dup_id").isNull, 1)).as("n_after_near"))
      .orderBy(col("source"))
  }

  // ---- connected-component duplicate clusters: the transitive closure
  //      of the minhash-LSH candidate graph. Pairwise near-dup drops
  //      (q18_dedup_resolve's greedy rule) under-collapse chains
  //      A~B~C where A and C never pair directly; a training-data run
  //      at 100 TB resolves survivors per CONNECTED COMPONENT, keeping
  //      one doc per cluster. Spark side: iterative min-label
  //      propagation over the edge set — labels only decrease, each
  //      round is one shuffle join + a map-side-combinable min, and
  //      convergence (sum of labels stable) is a driver-checked
  //      aggregate, never collected data. Edge generation is per-bucket
  //      STARS (bucket-min — member): connectivity-equivalent to the
  //      all-pairs bucket clique but linear in bucket size, so the LSH
  //      candidate graph never materializes a |B|² pair set here at
  //      all. Duplicate clusters arrive already star-shaped and settle
  //      in the first contraction round; for long-chain graphs the
  //      alternating large/small-star loop handles the general case
  //      without changing the result. Oracle: DuckDB recursive CTE
  //      computing min reachable label over the PAIR graph — equal
  //      components by the clique/star equivalence. ----
  /** Oracle CTE chain from `incoming` to `comp(node, component)` —
    * shared by q18_cc_dedup and q18_dup_stats. */
  // MATERIALIZED hints (DuckDB-only syntax; the oracle never runs on
  // Spark): without them DuckDB INLINES these CTEs — `bands` re-runs
  // the whole shingle→minhash pipeline through `mh` four times, the
  // recursive `walk` re-evaluates `sym` (and everything under it) on
  // EVERY iteration, and leakage_split's crossx re-inlines `e` four
  // more times. On the padded multi-frame sf0.1 fixture that plan
  // spilled >70 GB of DuckDB temp and filled the disk; materialized,
  // the same query answers in ~5 s (round-13 fixture study).
  private val ccCompSql =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM incoming),
       |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM w, unnest(range(1, len(ws)-1)) AS t(i)),
       |hh AS (SELECT doc_id, md5(shingle) AS h FROM sh),
       |mh AS MATERIALIZED (SELECT doc_id,
       |         min(substr(h, 1, 4) || h) AS h0, min(substr(h, 5, 4) || h) AS h1,
       |         min(substr(h, 9, 4) || h) AS h2, min(substr(h, 13, 4) || h) AS h3,
       |         min(substr(h, 17, 4) || h) AS h4, min(substr(h, 21, 4) || h) AS h5,
       |         min(substr(h, 25, 4) || h) AS h6, min(substr(h, 29, 4) || h) AS h7
       |       FROM hh GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  SELECT doc_id, band, bucket FROM (
       |    SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM mh
       |    UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM mh
       |    UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM mh
       |    UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM mh) u),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |sym AS MATERIALIZED (SELECT a, b FROM e UNION SELECT b, a FROM e),
       |walk(node, lbl) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT s.b, w2.lbl FROM walk w2 JOIN sym s ON s.a = w2.node
       |  WHERE w2.lbl < s.b),
       |comp AS MATERIALIZED (SELECT node, min(lbl) AS component FROM walk GROUP BY node)"""
      .stripMargin

  val q18CcDedup: QueryDef = QueryDef(
    "q18_cc_dedup",
    s"""WITH RECURSIVE $withDupesSql,
       |$ccCompSql
       |SELECT component, count(*) AS n_members, CAST(sum(node) AS BIGINT) AS id_sum
       |FROM comp
       |GROUP BY component
       |ORDER BY component""".stripMargin) { (spark, dir) =>
    // Bucket-STAR edges, not bucket-pair edges (round-11): all-pairs
    // edges inside a bucket and star edges (bucket-min — member) have
    // IDENTICAL connectivity — a bucket is one clique either way, and
    // the node set (docs sharing any bucket of size ≥ 2) is the same —
    // but the star generator emits Σ|B| edges instead of Σ|B|², so no
    // quadratic candidate volume exists to guard. Plain stars DOUBLE
    // the graph diameter vs cliques (two docs in sibling buckets are 4
    // hops apart instead of 2), which the min-guard caught as 2× more
    // contraction rounds at 10× — so each doc also links its own
    // buckets' minima together (≤ bands-1 extra edges per doc, still
    // linear): the shortcut restores clique-like diameter and the
    // components are unchanged (every added edge connects nodes
    // already connected through the doc itself). The oracle's
    // recursive CTE walks the pair graph; components are provably
    // equal.
    ccClustersCached(spark, dir)
      .orderBy(col("component"))
  }

  /** The converged (component, n_members, id_sum) cluster frame,
    * materialized once per (session, corpus): q18_cc_dedup presents
    * it and q18_dup_stats aggregates it — a production dedup run
    * computes components once and every report reads the table. The
    * checkpoint is cluster-count-sized (never corpus text), and the
    * iterative contraction's own intermediates are already freed by
    * CacheHygiene inside componentsFromEdges. */
  private val ccClusterCache = new SessionCache[String, DataFrame]()

  /** The (node, component) map underneath [[ccClustersCached]],
    * session-cached separately because cluster-aware CONSUMERS join
    * through it at node grain (q18_leakage_split's root assignment)
    * while the reports read the aggregate. Node-count-sized (only
    * docs appearing in some ≥2 bucket), never corpus text. */
  private val ccNodeMapCache = new SessionCache[String, DataFrame]()

  private def ccNodeMapCached(spark: SparkSession, dir: String): DataFrame =
    CacheResidence.memo("cc", ccNodeMapCache, spark, dir) {
      val bands = bandIndex(spark, dir, dupes = true)
      val mins = bands.groupBy(col("band"), col("bucket"))
        .agg(min(col("doc_id")).as("m"), count(lit(1)).as("n"))
        .where(col("n") > 1)
      val withMin = bands.join(mins, Seq("band", "bucket"))
      val starEdges = withMin
        .where(col("doc_id") =!= col("m"))
        .select(col("m").as("a"), col("doc_id").as("b"))
      val minLinks = withMin
        .groupBy(col("doc_id"))
        .agg(min(col("m")).as("a"), collect_set(col("m")).as("ms"))
        .select(col("a"), explode(col("ms")).as("b"))
        .where(col("a") =!= col("b"))
      val edges = starEdges.union(minLinks).distinct()
      CacheResidence.resident("cc", componentMapFromEdges(edges))
    }

  private def ccClustersCached(spark: SparkSession, dir: String): DataFrame =
    CacheResidence.memo("cc", ccClusterCache, spark, dir) {
      CacheResidence.resident("cc", ccNodeMapCached(spark, dir)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"), sum(col("node")).as("id_sum")))
    }

  // ---- dedup yield report: the cluster-size histogram + removal
  //      arithmetic every production dedup run publishes ("N docs in,
  //      M unique out, K% removed, cluster-size tail"). Composes the
  //      SESSION-CACHED component frame — computing clusters is the
  //      expensive step, reporting on them must not repeat it. The
  //      cluster_size = 1 row is the singleton count (corpus minus
  //      docs appearing in any ≥2-cluster) with docs_removed = 0;
  //      every other row aggregates equal-size clusters, each
  //      removing size − 1 docs under keep-one-per-cluster. ----
  val q18DupStats: QueryDef = QueryDef(
    "q18_dup_stats",
    s"""WITH RECURSIVE $withDupesSql,
       |$ccCompSql,
       |cl AS (SELECT component, count(*) AS n_members FROM comp GROUP BY component),
       |hist AS (SELECT n_members AS cluster_size, count(*) AS n_clusters,
       |                sum(n_members - 1) AS docs_removed
       |         FROM cl GROUP BY n_members),
       |tot AS (SELECT count(*) AS t FROM incoming),
       |incl AS (SELECT coalesce(sum(n_members), 0) AS c FROM cl)
       |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       |       CAST(n_clusters AS BIGINT) AS n_clusters,
       |       CAST(docs_removed AS BIGINT) AS docs_removed
       |FROM hist
       |UNION ALL
       |SELECT 1, CAST(t - c AS BIGINT), 0 FROM tot, incl
       |ORDER BY cluster_size""".stripMargin) { (spark, dir) =>
    val comp = ccClustersCached(spark, dir)
    val hist = comp.groupBy(col("n_members"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("n_members") - 1).as("docs_removed"))
      .select(col("n_members").as("cluster_size"),
        col("n_clusters"), col("docs_removed"))
    val tot = withDupes(docs(spark, dir)).agg(count(lit(1)).as("t"))
    val incl = comp.agg(coalesce(sum(col("n_members")), lit(0L)).as("c"))
    val singles = tot.crossJoin(broadcast(incl))
      .select(lit(1L).as("cluster_size"),
        (col("t") - col("c")).as("n_clusters"),
        lit(0L).as("docs_removed"))
    hist.select(col("cluster_size").cast("long"), col("n_clusters").cast("long"),
        col("docs_removed").cast("long"))
      .union(singles)
      .orderBy(col("cluster_size"))
  }

  /** Eager localCheckpoint that ALSO resets the statistics estimate:
    * Spark's checkpoint preserves the origin plan's stats, and a
    * join's size estimate is the product of its children's — so an
    * iterative loop's estimate SQUARES every round and by round ~15
    * Catalyst is multiplying million-digit BigIntegers during
    * planning (observed as a hard hang in stats estimation).
    * Rebuilding the frame over the checkpointed RDD gives each
    * round's leaf the flat default estimate. */
  private def flatCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Connected components of an undirected (a, b) edge frame as
    * (component = min reachable node, n_members, id_sum), via
    * alternating large-star / small-star contraction (the MapReduce
    * CC algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond"): each round every node connects part of
    * its neighborhood directly to its neighborhood minimum, which
    * provably converges in O(log² n) rounds on ANY graph — plain
    * min-label propagation is O(diameter) and label-shortcut variants
    * still crawl linearly on id-shuffled chains (measured), which
    * would silently truncate at a round cap. ConnectedComponentsSpec
    * pins shuffled 100-chains converging well inside the cap, and
    * non-convergence throws rather than returning partial components.
    * Duplicate clusters are near-cliques that settle in 2-3 rounds.
    * Each round is one groupBy + join on the edge frame (shuffle on
    * node id), materialized via flatCheckpoint — eager truncation
    * keeps the per-round plan flat AND the stats estimate constant.
    * On a multi-node cluster a long-running loop would use reliable
    * checkpoint() (localCheckpoint blocks die with their executor);
    * for this bounded loop the recompute window is seconds. */
  /** Exact connected components of a small edge frame in one executor
    * task: min-rooted union-find with path compression over the
    * coalesced edges, returning (a = node, b = component min) — the
    * same star-union shape the distributed contraction converges to,
    * so the downstream labeling is shared. Used by
    * [[componentsFromEdges]] below its local-finish gate; a LongMap
    * over 2M edges is ~32 MB, comfortably one task. */
  private[operators] def localComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        val nodes = scala.collection.mutable.LongMap.empty[Unit]
        it.foreach { case (a, b) =>
          nodes(a) = (); nodes(b) = ()
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        nodes.keysIterator.map(n => (n, find(n)))
      }
      .toDF("a", "b")
  }

  /** (node, component) over the dup-candidate graph: alternating
    * large/small-star contraction to a min-rooted star union, then a
    * label join back over the original node set. Nodes outside any
    * edge never appear (callers left-join and coalesce to self). */
  private[graft] def componentMapFromEdges(edges: DataFrame): DataFrame = {
    val sym = flatCheckpoint(
      edges.union(edges.select(col("b").as("a"), col("a").as("b"))))

    // one star round over canonical (larger → smaller) edges: connect
    // the chosen half of each node's neighborhood to the neighborhood
    // min m(u) = least(u, min Γ(u)). Large-star rewires strictly
    // larger neighbors, small-star the rest — together they contract
    // every component to a star centered at its minimum.
    def starRound(e: DataFrame, large: Boolean): DataFrame = {
      val nbrs = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mTab = nbrs.groupBy(col("a"))
        .agg(least(col("a"), min(col("b"))).as("m"))
      val withM = nbrs.join(mTab, Seq("a"))
      val rewired =
        if (large) withM.where(col("b") > col("a"))
          .select(col("b").as("a"), col("m").as("b"))
        else
          // small-star also keeps the center–min edge (v ∈ N⁻(u) ∪ {u}
          // in the paper) — without it a center with only smaller
          // neighbors would drop out of its own component
          withM.where(col("b") <= col("a"))
            .select(col("b").as("a"), col("m").as("b"))
            .union(mTab.select(col("a"), col("m").as("b")))
      rewired
        .where(col("a") =!= col("b"))
        .distinct()
    }

    def checksum(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)), sum(col("a")), sum(col("b"))).first()
      if (r.getLong(0) == 0L) (0L, 0L, 0L)
      else (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    val spark = sym.sparkSession
    val maxRounds = 30 // O(log² n): 30 doubles past any realistic graph
    // Local-finish gate: once the (already-counted) edge set fits one
    // executor task, exact union-find in that task beats more
    // distributed rounds — each star round is ~6 driver-sequenced
    // shuffle stages whose fixed overhead dominates on a shrunken
    // graph (measured: the sf0.1 LSH graph enters BELOW the gate and
    // cc_dedup spends its time on round scheduling, not data). At
    // corpus scale the first rounds run distributed and shrink the
    // edge set geometrically, so the gate bounds the round count by
    // log(E/threshold) instead of log²(n) and the convergence TAIL
    // (the last, tiniest, slowest-converging rounds) collapses into
    // one task. 2M edges ≈ 32 MB of LongMap — well inside an executor
    // task; spark.graft.cc.localFinishEdges=0 forces the pure
    // distributed loop (ConnectedComponentsSpec pins its convergence
    // separately).
    val localGate = spark.conf.getOption("spark.graft.cc.localFinishEdges")
      .map(_.toLong).getOrElse(2000000L)
    var cur = sym
    // cache hygiene: each round's flatCheckpoint leaves a dead cached
    // copy of the previous round's edge set; free it once the new
    // round is materialized. `sym` and the FINAL round stay cached —
    // both feed the returned (lazy) frame, and a truncated-lineage
    // checkpoint cannot be recomputed after unpersist.
    var curIds = Set.empty[Int]
    var curSum = checksum(cur)
    var converged = curSum._1 <= localGate
    var iter = 0
    while (!converged && iter < maxRounds) {
      val (next, nextIds) = graft.core.CacheHygiene.withNewPersisted(spark)(
        flatCheckpoint(starRound(starRound(cur, large = true), large = false)))
      val nextSum = checksum(next)
      converged = nextSum == curSum || nextSum._1 <= localGate
      graft.core.CacheHygiene.unpersist(spark, curIds)
      cur = next
      curIds = nextIds
      curSum = nextSum
      iter += 1
    }
    require(converged,
      s"connected components did not converge in $maxRounds rounds")
    if (sys.env.contains("SPARK_GRAFT_DEBUG"))
      System.err.println(s"[graft.cc] contraction rounds: $iter" +
        s" localFinish=${curSum._1 <= localGate} edges=${curSum._1}")
    // Below the gate: exact min-rooted union-find over the remaining
    // edges in ONE task (an executor task, not a driver collect),
    // emitting the same (node, root) star-union shape the converged
    // loop produces. Above it: the loop's fixed point IS that union.
    val starUnion =
      if (curSum._1 <= localGate) SimilarityQueries.localComponents(cur)
      else cur
    // converged edge set is a union of stars (v, root): label every
    // node from the ORIGINAL graph with its root, roots label
    // themselves
    val lblMap = starUnion.groupBy(col("a").as("node")).agg(min(col("b")).as("root"))
    sym.select(col("a").as("n")).distinct()
      .join(lblMap, col("n") === col("node"), "left")
      .select(col("n").as("node"), coalesce(col("root"), col("n")).as("component"))
  }

  /** The historical aggregate view of [[componentMapFromEdges]] —
    * (component, n_members, id_sum) — kept as the convergence-spec
    * surface (ConnectedComponentsSpec drives both the distributed
    * loop and the local-finish path through it). */
  private[operators] def componentsFromEdges(edges: DataFrame): DataFrame =
    componentMapFromEdges(edges)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"), sum(col("node")).as("id_sum"))

  // ---- label-blocked kNN graph: every vector's top-2 nearest
  //      neighbors within its block — the primitive under embedding
  //      clustering, semantic dedup chains, and diversity sampling.
  //      The block key bounds the pair enumeration exactly like the
  //      IVF list does (|block|² pairs per block, never corpus²), the
  //      dot products are the codegen'd integer kernel, and the
  //      per-vector top-2 is a row_number window on vec_id that rides
  //      the pair join's own partitioning; cosine ties break on
  //      neighbor id so the ranking is engine-independent.
  //      MEASURED caveat (SCALING.md, round 6): |block|² means the
  //      cluster count K MUST grow with the corpus — K held fixed at
  //      10× data ran 71×; K ∝ n (constant cluster size, the kmeans
  //      retraining knob) runs at slope 0.69. A misconfigured run
  //      fails FAST, not quadratically: ScaleOps.guardBlockSize
  //      aborts before the pair join when any block exceeds
  //      spark.graft.guard.maxBlockRows (BlockGuardSpec). ----
  val q18KnnGraph: QueryDef = QueryDef(
    "q18_knn_graph",
    s"""WITH $quantSql,
       |pairs AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS nb_id,
       |         ${dotQSql("a.q", "b.q")} AS dot_s,
       |         a.n2 AS n2_a, b.n2 AS n2_b
       |  FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id <> b.vec_id),
       |sc AS (
       |  SELECT vec_id, nb_id,
       |         CAST(dot_s AS DOUBLE)
       |           / (sqrt(CAST(n2_a AS DOUBLE)) * sqrt(CAST(n2_b AS DOUBLE))) AS cosine
       |  FROM pairs),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY cosine DESC, nb_id) AS rnk
       |  FROM sc)
       |SELECT vec_id, rnk, nb_id, cosine FROM rk WHERE rnk <= 2
       |ORDER BY vec_id, rnk""".stripMargin) { (spark, dir) =>
    val qn = ScaleOps.guardBlockSize(quantized(embs(spark, dir)), "label",
      "q18_knn_graph pair join")
    val a = qn.select(col("label"), col("vec_id"),
      col("q").as("qa"), col("n2").as("n2_a"))
    val b = qn.select(col("label"), col("vec_id").as("nb_id"),
      col("q").as("qb"), col("n2").as("n2_b"))
    val cosine = col("dot_s").cast("double") /
      (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nb_id"))
    a.join(b, Seq("label"))
      .where(col("vec_id") =!= col("nb_id"))
      .select(col("vec_id"), col("nb_id"), dotQ("qa", "qb").as("dot_s"),
        col("n2_a"), col("n2_b"))
      .select(col("vec_id"), col("nb_id"), cosine.as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 2)
      .select(col("vec_id"), col("rnk"), col("nb_id"), col("cosine"))
      .orderBy(col("vec_id"), col("rnk"))
  }

  // ---- per-block centroid computation (the Lloyd/IVF training step
  //      and the cluster-summarization primitive): element-wise
  //      integer sums of the quantized vectors per label, probed on
  //      the first 4 dims for the oracle. The dim explode is a
  //      Generate; the (label, dim) aggregate is map-side partial —
  //      all integer, so the mean is engine- and order-independent.
  //      At 100 TB the full-width variant aggregates the quantized
  //      array with an element-wise agg (zip_with over a fold), never
  //      exploding dims through a shuffle; the per-dim form here
  //      keeps the oracle in plain SQL. ----
  val q18Centroids: QueryDef = QueryDef(
    "q18_centroids",
    s"""WITH quant AS (
       |  SELECT vec_id, label,
       |         list_transform(embedding,
       |           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q
       |  FROM embeddings),
       |u AS (
       |  SELECT label, i AS dim, q[i] AS qi
       |  FROM quant, unnest(range(1, len(q) + 1)) t(i)
       |  WHERE i <= 4)
       |SELECT label, dim, CAST(sum(qi) AS BIGINT) AS sum_q, count(*) AS n,
       |       CAST(sum(qi) AS BIGINT) // count(*) AS mean_q
       |FROM u GROUP BY label, dim ORDER BY label, dim""".stripMargin) {
    (spark, dir) =>
      quantized(embs(spark, dir))
        .select(col("label"), posexplode(col("q")).as(Seq("dim0", "qi")))
        .where(col("dim0") < 4)
        .select(col("label"), (col("dim0") + 1).cast("long").as("dim"), col("qi"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("qi")).as("sum_q"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"), col("sum_q"), col("n"),
          expr("sum_q div n").as("mean_q"))
        .orderBy(col("label"), col("dim"))
  }

  // ---- embedding drift monitor: per-label centroid distance from
  //      the corpus centroid, in integer basis points — the signal an
  //      embedding pipeline watches to catch model/version drift or a
  //      source whose vectors wandered (retrain trigger, ANN-index
  //      rebuild trigger). All arithmetic exact after the ONE shared
  //      ×1e6 quantization (the same quantize every embedding
  //      operator rides): per-dim means are integer div of exact
  //      integer sums, the distance is Σ(Δ per-dim mean)² in BIGINT,
  //      normalized by the global centroid's squared norm. Scale: one
  //      posexplode pass → (label, dim)-keyed exact sums (map-side
  //      combinable, 64·|labels| result rows), the global centroid
  //      derived by a second tiny aggregate — no per-vector state
  //      leaves the scan, no window, broadcast-sized joins only. ----
  val q18EmbedDrift: QueryDef = QueryDef(
    "q18_embed_drift",
    s"""WITH $quantSql,
       |u AS (SELECT label, i AS dim, q[i] AS qi
       |      FROM quant, unnest(range(1, len(q)+1)) t(i)),
       |lab AS (SELECT label, dim, CAST(sum(qi) AS BIGINT) // count(*) AS ml, count(*) AS nv
       |        FROM u GROUP BY label, dim),
       |gm AS (SELECT dim, CAST(sum(qi) AS BIGINT) // count(*) AS mg FROM u GROUP BY dim),
       |gg AS (SELECT CAST(sum(mg*mg) AS BIGINT) AS gg FROM gm),
       |d AS (SELECT label, CAST(sum((ml-mg)*(ml-mg)) AS BIGINT) AS l2sq,
       |             CAST(min(nv) AS BIGINT) AS n_vecs
       |      FROM lab JOIN gm USING (dim) GROUP BY label)
       |SELECT CAST(label AS BIGINT) AS label, n_vecs, l2sq,
       |       CAST(l2sq * 10000 // gg AS BIGINT) AS drift_bp
       |FROM d CROSS JOIN gg ORDER BY label""".stripMargin) { (spark, dir) =>
    val u = quantized(embs(spark, dir))
      .select(col("label"), posexplode(col("q")).as(Seq("dim0", "qi")))
      .select(col("label"), (col("dim0") + 1).cast("long").as("dim"), col("qi"))
    val lab = u.groupBy(col("label"), col("dim"))
      .agg(expr("CAST(sum(qi) AS BIGINT) div count(1)").as("ml"),
        count(lit(1)).as("nv"))
    val gm = u.groupBy(col("dim"))
      .agg(expr("CAST(sum(qi) AS BIGINT) div count(1)").as("mg"))
    val gg = gm.agg(expr("CAST(sum(mg*mg) AS BIGINT)").as("gg"))
    lab.join(gm, Seq("dim"))
      .groupBy(col("label"))
      .agg(expr("CAST(sum((ml-mg)*(ml-mg)) AS BIGINT)").as("l2sq"),
        min(col("nv")).cast("long").as("n_vecs"))
      .crossJoin(broadcast(gg))
      .select(col("label").cast("long").as("label"), col("n_vecs"), col("l2sq"),
        expr("l2sq * 10000 div gg").as("drift_bp"))
      .orderBy(col("label"))
  }

  // ---- integer PageRank over the near-dup graph (3 unrolled
  //      iterations, d = 0.85): centrality on the duplicate graph
  //      ranks the "template" documents whose boilerplate spread the
  //      widest — complementary to the CC operator (which only labels
  //      membership). All arithmetic is exact fixed point: rank scaled
  //      ×1e6, per-edge contribution pr div (100·deg), damping as
  //      integer 85/100·sum + 150000 — identical truncation on both
  //      engines, so the oracle hash-matches where float PageRank
  //      never could. Near-clique components correctly converge to
  //      uniform rank; irregular ones differentiate. Each iteration is
  //      one join + one map-side-combinable sum on the edge frame —
  //      the same shuffle budget as a CC round; a variable-round
  //      variant would reuse flatCheckpoint, but 3 unrolled rounds
  //      keep the lineage flat without it. ----
  val q18Pagerank: QueryDef = QueryDef(
    "q18_pagerank",
    s"""WITH $minhashSql,
       |e AS (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
       |deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY a),
       |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |it1 AS (SELECT s.b AS node, CAST(150000 + 85 * sum(p.pr // (100 * g.d)) AS BIGINT) AS pr
       |        FROM sym s JOIN pr0 p ON s.a = p.node JOIN deg g ON s.a = g.node GROUP BY s.b),
       |it2 AS (SELECT s.b AS node, CAST(150000 + 85 * sum(p.pr // (100 * g.d)) AS BIGINT) AS pr
       |        FROM sym s JOIN it1 p ON s.a = p.node JOIN deg g ON s.a = g.node GROUP BY s.b),
       |it3 AS (SELECT s.b AS node, CAST(150000 + 85 * sum(p.pr // (100 * g.d)) AS BIGINT) AS pr
       |        FROM sym s JOIN it2 p ON s.a = p.node JOIN deg g ON s.a = g.node GROUP BY s.b)
       |SELECT node, pr FROM it3 ORDER BY pr DESC, node LIMIT 20""".stripMargin) {
    (spark, dir) =>
      val edges = lshCandidates(spark, dir, dupes = false)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      // Local-finish gate (the cc_dedup/BPE pattern — and here the
      // result is BIT-exact by construction, not by careful tie-break
      // parity: every PR value is a BIGINT and each round is pure
      // integer arithmetic (150000 + 85·Σ pr div (100·d)), and integer
      // sums are exact and commutative, so task count cannot change a
      // single value). Below spark.graft.pr.localEdges (default 2M sym
      // edges — the cc gate's sizing) the three rounds run in ONE task
      // instead of a 9-shuffle three-round plan whose codegen alone
      // dominates a small graph; above it the distributed plan below
      // is unchanged. PagerankLocalSpec pins local == distributed on
      // the real corpus and on a shuffled synthetic graph.
      val gate = spark.conf.getOption("spark.graft.pr.localEdges")
        .map(_.toLong).getOrElse(2000000L)
      val it3 =
        if (sym.count() <= gate) localPagerank(sym)
        else {
          val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
          def round(p: DataFrame): DataFrame =
            sym
              .join(p.select(col("node").as("src"), col("pr")), col("a") === col("src"))
              .join(deg.select(col("node").as("srcd"), col("d")), col("a") === col("srcd"))
              .select(col("b").as("node"), expr("pr div (100 * d)").as("c"))
              .groupBy(col("node"))
              .agg((lit(150000L) + lit(85L) * sum(col("c"))).as("pr"))
          round(round(round(deg.select(col("node"), lit(1000000L).as("pr")))))
        }
      it3.orderBy(col("pr").desc, col("node")).limit(20)
  }

  /** Three integer-PageRank rounds over a small symmetric edge frame
    * in one executor task — bit-identical to the distributed rounds
    * (all-integer arithmetic; sums are exact and commutative). Emits
    * (node, pr) after round 3. */
  private[operators] def localPagerank(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val edges = it.toArray
        val deg = scala.collection.mutable.LongMap.empty[Long]
        edges.foreach { case (a, _) => deg(a) = deg.getOrElse(a, 0L) + 1L }
        var pr = scala.collection.mutable.LongMap.empty[Long]
        deg.keysIterator.foreach(n => pr(n) = 1000000L)
        for (_ <- 1 to 3) {
          val next = scala.collection.mutable.LongMap.empty[Long]
          edges.foreach { case (a, b) =>
            next(b) = next.getOrElse(b, 0L) + pr(a) / (100L * deg(a))
          }
          next.transformValues(v => 150000L + 85L * v)
          pr = next
        }
        pr.iterator.map { case (n, v) => (n, v) }
      }
      .toDF("node", "pr")
  }

  // ---- edit-distance verification of LSH candidates (the exact
  //      confirm stage of a fuzzy-dedup pipeline — OCR noise, small
  //      edits): minhash band buckets nominate candidate pairs, then
  //      each pair gets ONE codegen'd levenshtein over the two texts and
  //      an integer normalized distance (permille of the longer text).
  //      Scale: the O(L²) DP runs only on the LSH-bounded pair set
  //      (735 pairs at sf0.1, never doc×doc); the text lookup is two
  //      equi-joins on doc_id. ----
  val q18EditDedup: QueryDef = QueryDef(
    "q18_edit_dedup",
    s"""WITH $minhashSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |       CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
       |       CAST(levenshtein(da.text, db.text) AS BIGINT) * 1000
       |         // greatest(length(da.text), length(db.text)) AS nd_permille
       |FROM cand c
       |JOIN documents da ON da.doc_id = c.doc_a
       |JOIN documents db ON db.doc_id = c.doc_b
       |WHERE CAST(levenshtein(da.text, db.text) AS BIGINT) * 1000
       |        // greatest(length(da.text), length(db.text)) <= 400
       |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    val cand = lshCandidates(spark, dir, dupes = false)
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    // Exact pruning, same result rows as the oracle's plain levenshtein:
    // nd_permille <= 400 ⟺ lev <= bound := (401·gmax − 1) div 1000, and
    // lev >= |Δlen| always — so (1) pairs with |Δlen| > bound skip the
    // kernel entirely, and (2) the kernel runs BANDED (threshold arg:
    // early-exit −1 past the bound), O(bound·L) instead of O(L²).
    // Honesty note (measured at 30× data): at THIS 40% relative
    // threshold the band covers most of the matrix and LSH candidates
    // are near-equal-length, so the runtime win is marginal — the
    // payoff grows as the dedup threshold tightens (at 10% the kernel
    // drops ~5×), which is where a production near-dup pass sits.
    val bound = "(401 * greatest(length(ta), length(tb)) - 1) div 1000"
    // Kernel-stage parallelism (profiled at 30× data: 28 s of a 43 s
    // query was the DP running in ONE task): left to itself, Spark
    // BROADCASTS the documents side and streams the byte-tiny pair set
    // through a shuffle whose read AQE coalesces to ONE partition — the
    // lev predicates (pushed down to just above these joins) then run
    // single-threaded. A post-join repartition cannot fix this (the
    // predicates are pushed back through it — measured: no change).
    // The shuffle_hash hints force the production plan: at 100 TB a
    // billion-pair candidate set cannot broadcast ANYWAY, both sides
    // shuffle on the doc key, and the kernel stage inherits the
    // shuffle's width (measured 28.4 s → 3.6 s at 30×; same rows).
    cand.hint("shuffle_hash")
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
      .hint("shuffle_hash")
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
      .where(expr(s"abs(length(ta) - length(tb)) <= $bound"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"CAST(levenshtein(ta, tb, CAST($bound AS INT)) AS BIGINT)").as("lev"),
        col("ta"), col("tb"))
      .where(col("lev") >= 0)
      .select(col("doc_a"), col("doc_b"), col("lev"),
        expr("(lev * 1000) div greatest(length(ta), length(tb))").as("nd_permille"))
      .where(col("nd_permille") <= 400)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- sparse TF-IDF cosine over LSH candidates (the sparse-vector
  //      twin of q18_dedup_embed's dense kernel): per (doc, word) a
  //      tf·idf weight rounded ONCE to integer micro-units, then each
  //      candidate pair's dot and norms are exact integer sums — the
  //      double division happens only at the very end, on identical
  //      integers in both engines. Work ∝ |candidate pairs| × doc
  //      length (the LSH bound), never corpus². ----
  val q18TfidfSim: QueryDef = QueryDef(
    "q18_tfidf_sim",
    s"""WITH $minhashSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents),
       |tf AS (SELECT doc_id, wd, count(*) AS tf FROM tok GROUP BY doc_id, wd),
       |df AS (SELECT wd, count(*) AS df FROM tf GROUP BY wd),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |wt AS (
       |  SELECT tf.doc_id, tf.wd,
       |         CAST(round(1000000 * tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df))
       |              AS BIGINT) AS w_um
       |  FROM tf JOIN df ON tf.wd = df.wd CROSS JOIN nd),
       |nrm AS (SELECT doc_id, CAST(sum(w_um * w_um) AS HUGEINT) AS n2
       |        FROM wt GROUP BY doc_id),
       |dots AS (
       |  SELECT c.doc_a, c.doc_b, CAST(sum(wa.w_um * wb.w_um) AS HUGEINT) AS dot
       |  FROM cand c
       |  JOIN wt wa ON wa.doc_id = c.doc_a
       |  JOIN wt wb ON wb.doc_id = c.doc_b AND wb.wd = wa.wd
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT d.doc_a, d.doc_b,
       |       CAST(d.dot AS DOUBLE)
       |         / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
       |FROM dots d
       |JOIN nrm na ON d.doc_a = na.doc_id
       |JOIN nrm nb ON d.doc_b = nb.doc_id
       |WHERE CAST(d.dot AS DOUBLE)
       |        / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) > 0.5
       |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    val cand = lshCandidates(spark, dir, dupes = false)
    // shared doc-term matrix (TextQueries session cache)
    val tf = TextQueries.termFreq(spark, dir)
      .select(col("doc_id"), col("w").as("wd"), col("tf"))
    val df = tf.groupBy(col("wd")).agg(count(lit(1)).as("df"))
    val nd = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val wt = tf.join(broadcast(df), Seq("wd")).crossJoin(broadcast(nd))
      .select(col("doc_id"), col("wd"),
        expr("CAST(round(1000000 * tf * ln(CAST(n_docs AS DOUBLE) / df)) AS BIGINT)")
          .as("w_um"))
    val nrm = wt.groupBy(col("doc_id"))
      .agg(sum(expr("CAST(w_um AS DECIMAL(19,0)) * w_um")).as("n2"))
    val dots = cand
      .join(wt.select(col("doc_id").as("doc_a"), col("wd"), col("w_um").as("wa")),
        Seq("doc_a"))
      .join(wt.select(col("doc_id").as("doc_b"), col("wd"), col("w_um").as("wb")),
        Seq("doc_b", "wd"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(expr("CAST(wa AS DECIMAL(19,0)) * wb")).as("dot"))
    val cosine = col("dot").cast("double") /
      (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double")))
    dots
      .join(nrm.select(col("doc_id").as("doc_a"), col("n2").as("n2_a")), Seq("doc_a"))
      .join(nrm.select(col("doc_id").as("doc_b"), col("n2").as("n2_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), cosine.as("cosine"))
      .where(col("cosine") > 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- quality-aware survivor resolution: the near-dup collapse rule
  //      production pipelines actually want — when two documents LSH-
  //      collide, KEEP THE BETTER ONE (here: the longer text; ties keep
  //      the smaller doc_id), not blindly the lowest id. Greedy and
  //      pairwise-deterministic: a doc drops if ANY candidate neighbor
  //      beats it, so the survivor set is order-independent under any
  //      partitioning. Reuses the session band index (one LSH pipeline
  //      per corpus, shared with sig/pairs/CC/PageRank); the loser set
  //      is ∝ duplicate density, so the resolve join is carried by the
  //      planner's own broadcast-vs-shuffle estimate — no hint. ----
  val q18ResolveQuality: QueryDef = QueryDef(
    "q18_resolve_quality",
    s"""WITH $minhashSql,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |sc AS (SELECT doc_id, length(text) AS sc FROM documents),
       |losers AS (
       |  SELECT DISTINCT CASE WHEN la.sc > lb.sc THEN p.doc_b
       |                       WHEN lb.sc > la.sc THEN p.doc_a
       |                       ELSE p.doc_b END AS doc_id
       |  FROM pairs p JOIN sc la ON p.doc_a = la.doc_id
       |               JOIN sc lb ON p.doc_b = lb.doc_id)
       |SELECT d.source, count(*) AS n_total,
       |       count(l.doc_id) AS n_dropped,
       |       CAST(sum(CASE WHEN l.doc_id IS NULL THEN length(d.text) END)
       |            AS BIGINT) AS kept_chars
       |FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin) { (spark, dir) =>
    val d = docs(spark, dir)
    val sc = d.select(col("doc_id"), length(col("text")).as("sc"))
    val pairs = lshCandidates(spark, dir, dupes = false)
    val losers = pairs
      .join(sc.select(col("doc_id").as("doc_a"), col("sc").as("sc_a")), Seq("doc_a"))
      .join(sc.select(col("doc_id").as("doc_b"), col("sc").as("sc_b")), Seq("doc_b"))
      .select(when(col("sc_a") > col("sc_b"), col("doc_b"))
        .when(col("sc_b") > col("sc_a"), col("doc_a"))
        .otherwise(col("doc_b")).as("loser_id"))
      .distinct()
    d.join(losers, col("doc_id") === col("loser_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        count(col("loser_id")).as("n_dropped"),
        sum(when(col("loser_id").isNull, length(col("text"))))
          .cast("long").as("kept_chars"))
      .orderBy(col("source"))
  }

  // ---- ANN recall evaluation: recall@3 of the IVF index vs the exact
  //      top-3 by the SAME integer dot-product metric — the quality
  //      gauge every production ANN deployment tracks next to its
  //      latency numbers (routing to one coarse cell trades recall for
  //      |cluster| work; this query prices that trade). Composes the
  //      REGISTERED q18_ann_ivf frame against a broadcast brute pass
  //      over the probe set, so the measured index is exactly the one
  //      the engine serves. Integer basis points, never a float ratio;
  //      probes with zero retained ground-truth hits still report
  //      (left join + count, not a semi-join). ----
  val q18AnnRecall: QueryDef = QueryDef(
    "q18_ann_recall",
    s"""WITH $quantSql,
       |exact0 AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |         ${dotQSql("p.q", "c.q")} AS dot_s
       |  FROM qn p JOIN qn c ON p.vec_id < 5 AND p.vec_id <> c.vec_id),
       |exact AS (
       |  SELECT probe_id, cand_id FROM (
       |    SELECT probe_id, cand_id,
       |           row_number() OVER (PARTITION BY probe_id
       |                              ORDER BY dot_s DESC, cand_id) AS rrk
       |    FROM exact0) e WHERE rrk <= 3),
       |dims AS (
       |  SELECT vec_id, label, i - 1 AS d, q[i] AS x
       |  FROM quant, unnest(range(1, len(q) + 1)) AS t(i)),
       |cent AS (
       |  SELECT label, d,
       |         CAST(round(CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cx
       |  FROM dims GROUP BY label, d),
       |probe_dist AS (
       |  SELECT p.vec_id, c.label,
       |         CAST(sum((p.x - c.cx) * (p.x - c.cx)) AS BIGINT) AS dist2
       |  FROM dims p JOIN cent c ON p.d = c.d
       |  WHERE p.vec_id < 5
       |  GROUP BY p.vec_id, c.label),
       |routed AS (
       |  SELECT vec_id AS probe_id, label AS probe_label FROM (
       |    SELECT vec_id, label,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist2, label) AS rn
       |    FROM probe_dist) r WHERE rn = 1),
       |pairs AS (
       |  SELECT r.probe_id, c.vec_id AS cand_id,
       |         ${dotQSql("p.q", "c.q")} AS dot_s
       |  FROM routed r
       |  JOIN qn p ON p.vec_id = r.probe_id
       |  JOIN qn c ON c.label = r.probe_label AND c.vec_id <> r.probe_id),
       |ivf AS (
       |  SELECT probe_id, cand_id FROM (
       |    SELECT probe_id, cand_id,
       |           row_number() OVER (PARTITION BY probe_id
       |                              ORDER BY dot_s DESC, cand_id) AS rnk
       |    FROM pairs) f WHERE rnk <= 3)
       |SELECT i.probe_id, CAST(count(e.cand_id) AS BIGINT) AS n_hits,
       |       count(*) AS n_ret,
       |       CAST((10000 * count(e.cand_id)) // 3 AS BIGINT) AS recall_bp
       |FROM ivf i LEFT JOIN exact e
       |  ON e.probe_id = i.probe_id AND e.cand_id = i.cand_id
       |GROUP BY i.probe_id ORDER BY i.probe_id""".stripMargin) { (spark, dir) =>
    val qn = quantized(embs(spark, dir))
    val probes = qn.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q").as("qp"))
    val cands = qn.select(col("vec_id").as("cand_id"), col("q").as("qc"))
    val byProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot_s").desc, col("cand_id"))
    val exact = broadcast(probes).join(cands, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"), dotQ("qp", "qc").as("dot_s"))
      .withColumn("rrk", row_number().over(byProbe))
      .where(col("rrk") <= 3)
      .select(col("probe_id"), col("cand_id"), lit(1).as("hit"))
    q18AnnIvf.build(spark, dir)
      .select(col("probe_id"), col("cand_id"))
      .join(exact, Seq("probe_id", "cand_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("hit")).as("n_hits"), count(lit(1)).as("n_ret"))
      .select(col("probe_id"), col("n_hits"), col("n_ret"),
        expr("(10000 * n_hits) div 3").as("recall_bp"))
      .orderBy(col("probe_id"))
  }

  // ---- minhash estimator quality: for every LSH candidate pair,
  //      the signature-estimated Jaccard (matching slots / 8, basis
  //      points) against the exact 3-gram Jaccard — the estimator
  //      error the dedup threshold actually absorbs (an 8-hash
  //      signature quantizes Jaccard to 1250 bp steps; this query
  //      prices that quantization on the pairs the pipeline really
  //      generates, the estimator twin of q18_ann_recall). Exact side
  //      is LSH-bounded: shingle sets are semi-join-pruned to
  //      candidate docs before the intersection join, so the confirm
  //      cost tracks |candidates|, not |corpus|². ----
  /** Exact 3-gram Jaccard (integer basis points) for a candidate pair
    * frame: shingle sets are semi-join-pruned to candidate docs before
    * the intersection join, so the confirm tracks |candidates|, not
    * |corpus|². Pairs whose docs have no shingles (< 3 words) drop —
    * identical to the oracle's inner size join. */
  /** (doc_a, doc_b, sz_a, sz_b, both_n) for a candidate pair frame:
    * shingle-set sizes plus exact intersection counts, the shared
    * exact-confirm basis for Jaccard (q18_minhash_quality /
    * q18_simhash_quality / q18_fuzzy_contam) and containment
    * (q18_containment). `d` is the (doc_id, text) frame: candidate
    * docs are pruned BEFORE the shingle explode (a broadcast semi-join
    * on the tiny candidate-id set), so neither the explode nor the
    * dedup shuffle ever carries a non-candidate row — the confirm is
    * |candidates|-bounded end to end, never corpus-bounded (earlier
    * forms shingled the whole corpus and pruned after: a full
    * corpus-sized explode+distinct per audit — SCALING.md round-11
    * containment note). */
  private def exactOverlap(spark: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val ids = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    // One reference, three plan consumers (both intersection sides +
    // the size aggregate): without the eager checkpoint each consumer
    // re-runs the candidate shingle derivation. The checkpointed frame
    // holds only candidate docs' shingles; the abandoned block is
    // reclaimed by the ContextCleaner once the query's plan is dropped.
    // At corpus scale deliberately NOT read off the shared docShingles
    // frame: the confirm is |candidates|-bounded, and pruning the
    // 300k-row docs scan BEFORE the explode is strictly cheaper than
    // filtering the ~16M-row materialized shingle frame per audit —
    // measured at 60×, the frame-semi-join form regressed
    // q18_fuzzy_contam 8.3 → 10.9 s (SCALING.md round-13
    // shingle-unification note). BELOW the row-count gate the ratio
    // inverts (optimization round 19): on a small corpus the candidate
    // ids cover a large doc fraction (20k of 30k docs for containment
    // at sf0.1), so re-shingling + a distinct exchange + an eager
    // checkpoint cost ~0.95 s per audit while the materialized frame —
    // already distinct (doc_id, shingle), already parquet — answers
    // both consumers with plain scans. Same free cached-count gate as
    // the q16_session density gate (EventTimeQueries): below 250k docs
    // the frame branch is strictly cheaper, at production scale the
    // docs-prune branch runs unchanged. Both branches are
    // row-identical (the frame IS the distinct shingle set of the
    // corpus, semi-joined to the same ids).
    val sh2 =
      if (ScaleOps.smallCorpus(spark, dir))
        docShingles(spark, dir).select(col("doc_id"), col("shingle"))
          .join(ids, Seq("doc_id"), "left_semi")
      else
        shingled(docs(spark, dir).join(ids, Seq("doc_id"), "left_semi"))
          .distinct()
          .localCheckpoint()
    val sizes = sh2.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // Intersection counts are enumerated FROM THE PAIR LIST, not from
    // a shingle-keyed self-join (optimization round 19). The old form
    //   sh2(doc_a) ⋈_shingle sh2(doc_b), doc_a < doc_b, groupBy pair
    // enumerated the co-occurrence pairs of EVERY doc pair sharing a
    // shingle and only then dropped non-candidates in the final left
    // join — at sf0.1 that one stage was 1.8 s of q18_containment's
    // 5.9 s (ProfileJobs job-level attribution), and its volume is
    // Σ_shingle df² over candidate docs: a corpus-common shingle
    // inside the candidate set makes it quadratic at scale — the
    // exact hazard guardBlockSize exists to kill, except unguarded.
    // This form walks cand → doc_a's shingles → equi-join on
    // (doc_b, shingle): volume is |cand| · |shingles per doc| rows,
    // |candidates|-bounded BY CONSTRUCTION at every scale, and the
    // per-pair counts are identical (sh2 is distinct (doc, shingle),
    // so matched rows per pair = |A ∩ B|; callers pass `cand`
    // deduplicated, which the final join relies on either way).
    //
    // NOT fused further (optimization round 20, measured rejection of
    // VERDICT r19 follow-up 2's "carry sizes through the pair walk"):
    // folding sz_a into the intersection aggregate (count(*) per pair
    // with the doc_b probe as a LEFT join) cuts 5 joins + 2 aggregates
    // to 3 + 2 — but the removed joins were ≤|cand|-row BROADCASTS
    // whose build jobs run CONCURRENTLY off the critical path, while
    // the left join pins its build side and serializes one big
    // broadcast INTO the path. Same-boot interleaved A/B:
    // q18_simhash_quality 0.66-1.02 s (this form) vs 1.20-1.68 s
    // (fused; ProfileJobs: one 0.58 s serial build job vs ten ≤0.18 s
    // overlapping jobs); a shuffle_hash hint on the probe didn't
    // recover it. Lesson recorded in OPTIMIZATION_r20.md: join-count
    // cuts only pay when the removed work was ON the critical path —
    // independent broadcast builds already overlap.
    val inter = cand
      .join(sh2.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh2.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("both_n"))
    cand
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"),
        coalesce(col("both_n"), lit(0L)).as("both_n"))
  }

  private def exactJaccardBp(spark: SparkSession, dir: String,
      cand: DataFrame): DataFrame =
    exactOverlap(spark, dir, cand)
      .select(col("doc_a"), col("doc_b"),
        expr("(10000 * both_n) div (sz_a + sz_b - both_n)")
          .cast("long").as("exact_bp"))

  val q18MinhashQuality: QueryDef = QueryDef(
    "q18_minhash_quality",
    s"""WITH $minhashSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |est AS (
       |  SELECT c.doc_a, c.doc_b,
       |         (CASE WHEN ma.h0 = mb.h0 THEN 1 ELSE 0 END
       |        + CASE WHEN ma.h1 = mb.h1 THEN 1 ELSE 0 END
       |        + CASE WHEN ma.h2 = mb.h2 THEN 1 ELSE 0 END
       |        + CASE WHEN ma.h3 = mb.h3 THEN 1 ELSE 0 END
       |        + CASE WHEN ma.h4 = mb.h4 THEN 1 ELSE 0 END
       |        + CASE WHEN ma.h5 = mb.h5 THEN 1 ELSE 0 END
       |        + CASE WHEN ma.h6 = mb.h6 THEN 1 ELSE 0 END
       |        + CASE WHEN ma.h7 = mb.h7 THEN 1 ELSE 0 END) AS n_match
       |  FROM cand c JOIN mh ma ON ma.doc_id = c.doc_a
       |              JOIN mh mb ON mb.doc_id = c.doc_b),
       |ids AS (SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand),
       |sh2 AS (SELECT s.doc_id, s.shingle FROM sh s JOIN ids USING (doc_id)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS both_n
       |  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT e.doc_a, e.doc_b, CAST(e.n_match AS BIGINT) AS n_match,
       |       CAST(e.n_match * 1250 AS BIGINT) AS est_bp,
       |       CAST((10000 * coalesce(i.both_n, 0))
       |            // (sa.sz + sb.sz - coalesce(i.both_n, 0)) AS BIGINT) AS exact_bp,
       |       CAST(abs(e.n_match * 1250
       |            - (10000 * coalesce(i.both_n, 0))
       |              // (sa.sz + sb.sz - coalesce(i.both_n, 0))) AS BIGINT) AS err_bp
       |FROM est e
       |JOIN sizes sa ON sa.doc_id = e.doc_a
       |JOIN sizes sb ON sb.doc_id = e.doc_b
       |LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
       |ORDER BY e.doc_a, e.doc_b""".stripMargin) { (spark, dir) =>
    val cand = lshCandidates(spark, dir, dupes = false)
    val mh = minhashIndex(spark, dir, dupes = false)
    val nMatch = (0 until 8)
      .map(j => when(col(s"ha$j") === col(s"hb$j"), 1).otherwise(0))
      .reduce(_ + _)
    val est = cand
      .join(mh.select(col("doc_id").as("doc_a") +:
        (0 until 8).map(j => col(s"h$j").as(s"ha$j")): _*), Seq("doc_a"))
      .join(mh.select(col("doc_id").as("doc_b") +:
        (0 until 8).map(j => col(s"h$j").as(s"hb$j")): _*), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), nMatch.as("n_match"))
    est
      .join(exactJaccardBp(spark, dir, cand), Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"),
        col("n_match").cast("long").as("n_match"),
        (col("n_match") * 1250).cast("long").as("est_bp"),
        col("exact_bp"),
        expr("abs(n_match * 1250 - exact_bp)").cast("long").as("err_bp"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- simhash estimator quality: for every pigeonhole candidate at
  //      hamming ≤ 2, the signature-implied similarity (the 32-bit
  //      hyperplane estimate cos(π·h/32), a THREE-value lookup in
  //      integer basis points — 10000/9952/9808) against the exact
  //      3-gram Jaccard — prices the SimhashDupStream gate the way
  //      q18_minhash_quality prices the LSH gate. Note the two scales
  //      differ by design (angular cosine vs set Jaccard): err_bp is
  //      the gate's systematic optimism on near-identical docs, the
  //      number a threshold-tuner actually reads. ----
  val q18SimhashQuality: QueryDef = QueryDef(
    "q18_simhash_quality",
    """WITH wrd AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |votes AS (
      |  SELECT doc_id, bit,
      |         sum(CASE WHEN strpos('89abcdef', substr(md5(w), bit + 1, 1)) > 0
      |                  THEN 1 ELSE -1 END) AS v
      |  FROM wrd, unnest(range(0, 32)) AS t(bit)
      |  GROUP BY doc_id, bit),
      |sigs AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN v > 0
      |                       THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
      |                       ELSE 0 END) AS BIGINT) AS sig
      |  FROM votes GROUP BY doc_id),
      |blocks AS (
      |  SELECT doc_id, j,
      |         CASE j WHEN 0 THEN sig & 2047
      |                WHEN 1 THEN (sig >> 11) & 2047
      |                ELSE (sig >> 22) & 1023 END AS blk
      |  FROM sigs, unnest(range(0, 3)) AS p(j)),
      |cand0 AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM blocks a JOIN blocks b
      |    ON a.j = b.j AND a.blk = b.blk AND a.doc_id < b.doc_id),
      |pr AS (
      |  SELECT doc_a, doc_b, bit_count(xor(sa.sig, sb.sig)) AS hamming
      |  FROM cand0
      |  JOIN sigs sa ON sa.doc_id = doc_a
      |  JOIN sigs sb ON sb.doc_id = doc_b
      |  WHERE bit_count(xor(sa.sig, sb.sig)) <= 2),
      |ids AS (SELECT doc_a AS doc_id FROM pr UNION SELECT doc_b FROM pr),
      |w2 AS (SELECT d.doc_id, string_split(d.text, ' ') AS ws
      |       FROM documents d JOIN ids USING (doc_id)),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |       FROM w2, unnest(range(1, len(ws)-1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS both_n
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT pr.doc_a, pr.doc_b, CAST(pr.hamming AS BIGINT) AS hamming,
      |       CAST(CASE pr.hamming WHEN 0 THEN 10000 WHEN 1 THEN 9952
      |            ELSE 9808 END AS BIGINT) AS est_bp,
      |       CAST((10000 * coalesce(i.both_n, 0))
      |            // (sa.sz + sb.sz - coalesce(i.both_n, 0)) AS BIGINT) AS exact_bp,
      |       CAST(abs(CASE pr.hamming WHEN 0 THEN 10000 WHEN 1 THEN 9952
      |                ELSE 9808 END
      |            - (10000 * coalesce(i.both_n, 0))
      |              // (sa.sz + sb.sz - coalesce(i.both_n, 0))) AS BIGINT) AS err_bp
      |FROM pr
      |JOIN sizes sa ON sa.doc_id = pr.doc_a
      |JOIN sizes sb ON sb.doc_id = pr.doc_b
      |LEFT JOIN inter i ON i.doc_a = pr.doc_a AND i.doc_b = pr.doc_b
      |ORDER BY pr.doc_a, pr.doc_b""".stripMargin) { (spark, dir) =>
    val est = simhashPairsCached(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"),
        expr("CAST(CASE hamming WHEN 0 THEN 10000 WHEN 1 THEN 9952 ELSE 9808 END AS BIGINT)")
          .as("est_bp"))
    est
      .join(exactJaccardBp(spark, dir,
        est.select(col("doc_a"), col("doc_b"))), Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("est_bp"),
        col("exact_bp"),
        expr("abs(est_bp - exact_bp)").cast("long").as("err_bp"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- asymmetric containment dedup, rare-shingle-blocked: Jaccard
  //      LSH structurally misses inclusion (a doc quoted inside one
  //      10× longer has J ≈ 0.1 but containment 1.0 — minhash bands
  //      almost never collide), yet inclusion is a primary
  //      training-data duplication mode (boilerplate-wrapped reposts,
  //      quote-heavy aggregations). Candidates come from RARE-shingle
  //      blocking (Broder containment sketches need the small side's
  //      sample; an inverted index on low-DF shingles is the
  //      production-scale equivalent): each doc registers its 4
  //      lowest-DF shingles with 2 ≤ DF ≤ 64 — DF ≥ 2 because a
  //      unique shingle can never collide, the DF cap because a
  //      common shingle's bucket is quadratic noise (the cap is the
  //      anti-quadratic bound: block size ≤ 64 BY CONSTRUCTION, with
  //      guardBlockSize enforcing it fail-fast). A contained doc
  //      shares ALL its shingles with its container, so its rarest
  //      shingles are exactly the ones the container also holds —
  //      recall degrades only when a contained doc's every shingle
  //      goes corpus-common, the regime where "containment" stops
  //      being meaningful. Confirm is the exact shingle intersection
  //      (shared exactOverlap helper, |candidates|-bounded);
  //      cont_bp = |A∩B| / min(|A|,|B|) in basis points, keep ≥ 8000.
  //      Measured blocking selectivity: 595 candidates at sf0.001 vs
  //      585 at sf0.01 — candidate volume tracks duplicate density,
  //      not corpus size. ----
  val q18Containment: QueryDef = QueryDef(
    "q18_containment",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |       FROM w, unnest(range(1, len(ws)-1)) AS t(i)),
      |dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
      |pick AS (
      |  SELECT doc_id, shingle FROM (
      |    SELECT s.doc_id, s.shingle,
      |           row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.shingle) AS rn
      |    FROM sh s JOIN dfq d USING (shingle)
      |    WHERE d.df BETWEEN 2 AND 64) z
      |  WHERE rn <= 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM pick a JOIN pick b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS both_n
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT i.doc_a, i.doc_b,
      |       CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
      |       CAST(i.both_n AS BIGINT) AS both_n,
      |       CAST(10000 * i.both_n // least(sa.sz, sb.sz) AS BIGINT) AS cont_bp
      |FROM inter i
      |JOIN sizes sa ON sa.doc_id = i.doc_a
      |JOIN sizes sb ON sb.doc_id = i.doc_b
      |WHERE 10000 * i.both_n // least(sa.sz, sb.sz) >= 8000
      |ORDER BY i.doc_a, i.doc_b""".stripMargin) { (spark, dir) =>
    // Session-cached candidate frame (optimization round 19, the
    // lshCandidates discipline): the rare-shingle index and its
    // self-join are a deterministic, duplicate-density-bounded
    // corpus-index artifact — computing it is the expensive step and
    // every execution of the audit must not repeat it. Built once per
    // (session, corpus); the derivation below is unchanged.
    val cand = CacheResidence.memo("containcand", containCandCache, spark, dir) {
      // ONE shuffle on top of the shared frame builds the whole
      // rare-shingle index: the capped distinct-set aggregate
      // (SetAgg.cappedDocSet, bounded state — a stop-shingle costs 64
      // longs and an O(1) overflow marker, never |df| memory) consumes
      // the session-cached docShingles checkpoint (round 13: the frame
      // is shared with the exact confirms and the HLL pair, so the
      // explode+distinct that builds it is paid ONCE per suite run, not
      // once per operator). df ∈ [2,64] falls out as the array size;
      // overflowed (NULL) groups ARE the df > 64 exclusion.
      val agg = docShingles(spark, dir)
        .groupBy(col("shingle"))
        .agg(SetAgg.cappedDocSet(col("doc_id"), 64).as("ds"))
        .where(col("ds").isNotNull && size(col("ds")).between(2, 64))
      // per-doc 4 rarest stop-shingles as a sorted-slice AGGREGATE, not
      // a row_number window (optimization round 19): struct sort order
      // (df, shingle) is exactly the old window's orderBy and (doc,
      // shingle) is unique, so slice(sort_array(...), 1, 4) keeps the
      // identical 4 rows — as a hash aggregate it drops the window's
      // per-doc sort pass; group state is bounded by a doc's
      // stop-shingle count (the same rows the window buffered per doc)
      val pick = agg
        .select(struct(size(col("ds")).cast("long").as("df"), col("shingle")).as("p"),
          explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id"))
        .agg(slice(sort_array(collect_list(col("p"))), 1, 4).as("ps"))
        .select(col("doc_id"), explode(col("ps")).as("p"))
        .select(col("doc_id"), col("p.shingle").as("shingle"))
        // tiny (≤ 4 rows/doc); checkpointed so the guard's size probe and
        // both self-join sides read it instead of re-running the index
        .localCheckpoint()
      val guarded = ScaleOps.guardBlockSize(pick, "shingle", "q18_containment")
      val pairs = guarded.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(guarded.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
      // residency size-gated like lshCandidates (round-14 doctrine:
      // a duplicate-dense corpus must not pin an unbounded pair set)
      if (ScaleOps.smallCorpus(spark, dir))
        CacheResidence.resident("containcand", pairs)
      else pairs
    }
    exactOverlap(spark, dir, cand)
      .withColumn("cont_bp",
        expr("(10000 * both_n) div least(sz_a, sz_b)").cast("long"))
      .where(col("cont_bp") >= 8000)
      .select(col("doc_a"), col("doc_b"),
        col("sz_a").cast("long").as("sz_a"), col("sz_b").cast("long").as("sz_b"),
        col("both_n").cast("long").as("both_n"), col("cont_bp"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- fuzzy decontamination: train docs that NEAR-duplicate the
  //      eval holdout (the q18_split/q18_contamination doc_id%10=3
  //      convention), found through the SAME minhash-LSH band index
  //      the dedup pipeline maintains. The exact 8-gram pass
  //      (q18_contamination) catches verbatim leakage; this pass
  //      catches the paraphrased / lightly-edited leakage an 8-gram
  //      equality can miss, at exact 3-gram Jaccard ≥ 7000 bp.
  //      Candidates are train×eval band-bucket collisions — the eval
  //      side is the SMALL side in production (a benchmark suite vs
  //      a 100 TB corpus), so AQE broadcasts it and the scan cost is
  //      one pass over the already-materialized band index; the
  //      bucket guard fail-fasts a degenerate eval bucket before the
  //      collision join. Confirm is the shared exact-Jaccard helper,
  //      |candidates|-bounded (shingles semi-join-pruned to candidate
  //      docs). ----
  val q18FuzzyContam: QueryDef = QueryDef(
    "q18_fuzzy_contam",
    s"""WITH $minhashSql,
       |cand AS (
       |  SELECT DISTINCT t.doc_id AS train_doc, e.doc_id AS eval_doc
       |  FROM bands t JOIN bands e
       |    ON t.band = e.band AND t.bucket = e.bucket
       |  WHERE t.doc_id % 10 <> 3 AND e.doc_id % 10 = 3),
       |ids AS (SELECT train_doc AS doc_id FROM cand
       |        UNION SELECT eval_doc FROM cand),
       |sh2 AS (SELECT s.doc_id, s.shingle FROM sh s JOIN ids USING (doc_id)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id),
       |inter AS (
       |  SELECT c.train_doc, c.eval_doc, count(*) AS both_n
       |  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle
       |  JOIN cand c ON c.train_doc = a.doc_id AND c.eval_doc = b.doc_id
       |  GROUP BY c.train_doc, c.eval_doc)
       |SELECT i.train_doc, i.eval_doc,
       |       CAST((10000 * i.both_n) // (sa.sz + sb.sz - i.both_n) AS BIGINT)
       |         AS jac_bp
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.train_doc
       |JOIN sizes sb ON sb.doc_id = i.eval_doc
       |WHERE (10000 * i.both_n) // (sa.sz + sb.sz - i.both_n) >= 7000
       |ORDER BY train_doc, eval_doc""".stripMargin) { (spark, dir) =>
    // session-cached like lshCandidates/containment's cand: the
    // train×eval collision pairs are a deterministic,
    // duplicate-density-bounded corpus-index artifact (optimization
    // round 19) — the guard fires on first build, as it would in the
    // production gate that maintains this index incrementally
    val cand = CacheResidence.memo("fuzzycand", fuzzyCandCache, spark, dir) {
      val bands = bandIndex(spark, dir, dupes = false)
      val ev = ScaleOps.guardBlockSize(
        bands.where(col("doc_id") % 10 === 3), "bucket", "q18_fuzzy_contam")
      val pairs = bands.where(col("doc_id") % 10 =!= 3)
        .select(col("doc_id").as("train_doc"), col("band"), col("bucket"))
        .join(ev.select(col("doc_id").as("eval_doc"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .select(col("train_doc"), col("eval_doc"))
        .distinct()
      // residency size-gated like lshCandidates (round-14 doctrine)
      if (ScaleOps.smallCorpus(spark, dir))
        CacheResidence.resident("fuzzycand", pairs)
      else pairs
    }
    // the shared confirm canonicalizes on doc_a < doc_b; restore the
    // train/eval orientation afterwards (split sides are disjoint, so
    // train_doc == eval_doc cannot occur)
    // no distinct (optimization round 19): `cand` is already a
    // distinct pair set and train/eval sides are disjoint, so
    // (least, greatest) maps cand rows 1:1 onto canonical pairs — the
    // old distinct re-shuffled the same set for nothing
    val canon = cand.select(
      least(col("train_doc"), col("eval_doc")).as("doc_a"),
      greatest(col("train_doc"), col("eval_doc")).as("doc_b"))
    cand
      .join(exactJaccardBp(spark, dir, canon),
        least(col("train_doc"), col("eval_doc")) === col("doc_a") &&
          greatest(col("train_doc"), col("eval_doc")) === col("doc_b"))
      .where(col("exact_bp") >= 7000)
      .select(col("train_doc"), col("eval_doc"), col("exact_bp").as("jac_bp"))
      .orderBy(col("train_doc"), col("eval_doc"))
  }

  // ---- leakage-safe train/val/test split: the assignment rule a
  //      pretraining pipeline applies AFTER near-dup detection — hash
  //      the CLUSTER ROOT, not the doc id, so every member of a
  //      near-dup cluster lands in one split and no eval document has
  //      a train-set twin. The query reports, for BOTH policies
  //      (cluster-root hash vs naive doc-id hash), per-split doc
  //      counts and the number of candidate-pair endpoints whose
  //      partner fell in a DIFFERENT split: structurally zero for the
  //      cluster policy (same component ⇒ same root ⇒ same split) and
  //      materially nonzero for the naive one on a duplicated corpus —
  //      the measured contamination that motivates cluster-aware
  //      splitting. Assignment = first hex nibble of md5 over the
  //      root's decimal rendering (identical string in Spark and
  //      DuckDB): ≤11 train (75%), 12–13 val, else test. Composes
  //      three session-cached frames — band index, node→component
  //      map, candidate pairs — so the marginal cost is three small
  //      joins and two rollups; at corpus scale the asg join shuffles
  //      on doc_id and the pair set stays duplicate-density-bounded
  //      (the LSH family's standing argument). ----
  val q18LeakageSplit: QueryDef = QueryDef(
    "q18_leakage_split",
    s"""WITH RECURSIVE $withDupesSql,
       |$ccCompSql,
       |roots AS (
       |  SELECT i.doc_id, coalesce(c.component, i.doc_id) AS root
       |  FROM incoming i LEFT JOIN comp c ON c.node = i.doc_id),
       |asg AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(root AS VARCHAR)), 1, 1)) - 1 <= 11 THEN 'train'
       |         WHEN strpos('0123456789abcdef', substr(md5(CAST(root AS VARCHAR)), 1, 1)) - 1 <= 13 THEN 'val'
       |         ELSE 'test' END AS cs,
       |    CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 <= 11 THEN 'train'
       |         WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 <= 13 THEN 'val'
       |         ELSE 'test' END AS ns
       |  FROM roots),
       |counts AS (
       |  SELECT policy, split, count(*) AS n_docs FROM (
       |    SELECT 'cluster' AS policy, cs AS split FROM asg
       |    UNION ALL SELECT 'naive', ns FROM asg) u
       |  GROUP BY policy, split),
       |ej AS (
       |  SELECT aa.cs AS acs, bb.cs AS bcs, aa.ns AS ans, bb.ns AS bns
       |  FROM e JOIN asg aa ON aa.doc_id = e.a JOIN asg bb ON bb.doc_id = e.b),
       |crossx AS (
       |  SELECT policy, split, sum(x) AS cross_edges FROM (
       |    SELECT 'cluster' AS policy, acs AS split, CASE WHEN acs <> bcs THEN 1 ELSE 0 END AS x FROM ej
       |    UNION ALL SELECT 'cluster', bcs, CASE WHEN acs <> bcs THEN 1 ELSE 0 END FROM ej
       |    UNION ALL SELECT 'naive', ans, CASE WHEN ans <> bns THEN 1 ELSE 0 END FROM ej
       |    UNION ALL SELECT 'naive', bns, CASE WHEN ans <> bns THEN 1 ELSE 0 END FROM ej) u
       |  GROUP BY policy, split)
       |SELECT c.policy, c.split, CAST(c.n_docs AS BIGINT) AS n_docs,
       |       CAST(coalesce(x.cross_edges, 0) AS BIGINT) AS cross_edges
       |FROM counts c LEFT JOIN crossx x ON x.policy = c.policy AND x.split = c.split
       |ORDER BY c.policy, c.split""".stripMargin) { (spark, dir) =>
    def splitOf(c: Column): Column = {
      val nib = conv(substring(md5(c.cast("string").cast("binary")), 1, 1), 16, 10)
        .cast("long")
      when(nib <= 11, "train").when(nib <= 13, "val").otherwise(lit("test"))
    }
    // three consumers (count rollup + both endpoint joins) → one eager
    // checkpoint of the tiny (doc_id, split, split) frame, the
    // triangles precedent
    val asg = withDupes(docs(spark, dir)).select(col("doc_id"))
      .join(ccNodeMapCached(spark, dir), col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        splitOf(coalesce(col("component"), col("doc_id"))).as("cs"),
        splitOf(col("doc_id")).as("ns"))
      .localCheckpoint()
    val counts = asg.select(explode(array(
        struct(lit("cluster").as("policy"), col("cs").as("split")),
        struct(lit("naive").as("policy"), col("ns").as("split")))).as("k"))
      .groupBy(col("k.policy").as("policy"), col("k.split").as("split"))
      .agg(count(lit(1)).as("n_docs"))
    val e = lshCandidates(spark, dir, dupes = true)
    val ej = e
      .join(asg.select(col("doc_id").as("doc_a"), col("cs").as("acs"), col("ns").as("ans")),
        Seq("doc_a"))
      .join(asg.select(col("doc_id").as("doc_b"), col("cs").as("bcs"), col("ns").as("bns")),
        Seq("doc_b"))
    val cross = ej.select(explode(array(
        struct(lit("cluster").as("policy"), col("acs").as("split"),
          (col("acs") =!= col("bcs")).cast("long").as("x")),
        struct(lit("cluster").as("policy"), col("bcs").as("split"),
          (col("acs") =!= col("bcs")).cast("long").as("x")),
        struct(lit("naive").as("policy"), col("ans").as("split"),
          (col("ans") =!= col("bns")).cast("long").as("x")),
        struct(lit("naive").as("policy"), col("bns").as("split"),
          (col("ans") =!= col("bns")).cast("long").as("x")))).as("k"))
      .groupBy(col("k.policy").as("policy"), col("k.split").as("split"))
      .agg(sum(col("k.x")).as("cross_edges"))
    counts.join(cross, Seq("policy", "split"), "left")
      .select(col("policy"), col("split"),
        col("n_docs").cast("long").as("n_docs"),
        coalesce(col("cross_edges"), lit(0L)).cast("long").as("cross_edges"))
      .orderBy(col("policy"), col("split"))
  }

  // ---- the full prep pipeline with the LEAKAGE-SAFE split folded
  //      in: quality filter → exact dedup → language rebalance →
  //      CLUSTER-ROOT train/val/test split → sequence packing, plus
  //      the cross-split near-dup edge count as a per-(split, lang)
  //      stage stat. This is q18_prep_pipeline with its one
  //      production gap closed: v1 splits by doc-hash, so two
  //      near-duplicates can land in train and test (the measured
  //      contamination q18_leakage_split quantifies); v2 assigns by
  //      the md5 prefix of the near-dup component ROOT (same
  //      'cc'/'e6' ≈ 80/10/10 quantiles as v1), so same component ⇒
  //      same root ⇒ same split and cross_edges is 0 BY CONSTRUCTION
  //      — which the oracle verifies, along with the per-cell
  //      doc/token/chunk counts. Composes the session-cached node→
  //      component map and band index (three small joins and two
  //      rollups on top of v1); every stage keeps v1's one-shuffle
  //      shape, packing stays shardedCum (no whole-partition window),
  //      and the edge set stays duplicate-density-bounded. ----
  val q18PrepPipelineV2: QueryDef = QueryDef(
    "q18_prep_pipeline_v2",
    s"""WITH RECURSIVE $withDupesSql,
       |$ccCompSql,
       |feat AS (
       |  SELECT doc_id, lang, text,
       |         len(string_split(text, ' ')) AS n_words,
       |         length(text) AS n_chars,
       |         len(list_filter(string_split(text, ' '),
       |             x -> x IN $stopList)) AS n_stop,
       |         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
       |  FROM documents),
       |qf AS (
       |  SELECT doc_id, lang, text, n_words FROM feat
       |  WHERE n_words >= 20 AND CAST(n_stop AS DOUBLE) / n_words >= 0.01
       |    AND CAST(n_digit AS DOUBLE) / n_chars < 0.3),
       |ex AS (
       |  SELECT doc_id, lang, n_words FROM (
       |    SELECT *, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
       |    FROM qf) WHERE keep),
       |lc AS (SELECT lang, count(*) AS n FROM ex GROUP BY lang),
       |tgt AS (SELECT min(n) AS target FROM lc),
       |rb AS (
       |  SELECT ex.doc_id, ex.lang, ex.n_words
       |  FROM ex JOIN lc ON ex.lang = lc.lang CROSS JOIN tgt
       |  WHERE ((CAST(ex.doc_id AS DECIMAL(38,0)) * 2654435761) % 1048576) * lc.n
       |        < CAST(tgt.target AS DECIMAL(38,0)) * 1048576),
       |spl AS MATERIALIZED (
       |  SELECT rb.doc_id, rb.lang, rb.n_words,
       |         CASE WHEN substr(md5(CAST(coalesce(c.component, rb.doc_id) AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |              WHEN substr(md5(CAST(coalesce(c.component, rb.doc_id) AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM rb LEFT JOIN comp c ON c.node = rb.doc_id),
       |pk AS (
       |  SELECT *,
       |         CAST((sum(n_words) OVER (PARTITION BY split, lang ORDER BY doc_id
       |                                  ROWS UNBOUNDED PRECEDING) - n_words) // 512
       |              AS BIGINT) AS chunk_id
       |  FROM spl),
       |base AS (
       |  SELECT split, lang, count(*) AS n_docs,
       |         CAST(sum(n_words) AS BIGINT) AS n_tokens,
       |         count(DISTINCT chunk_id) AS n_chunks
       |  FROM pk GROUP BY split, lang),
       |ej AS (
       |  SELECT aa.split AS asplit, aa.lang AS alang,
       |         bb.split AS bsplit, bb.lang AS blang
       |  FROM e JOIN spl aa ON aa.doc_id = e.a JOIN spl bb ON bb.doc_id = e.b),
       |lk AS (
       |  SELECT split, lang, sum(x) AS cross_edges FROM (
       |    SELECT asplit AS split, alang AS lang,
       |           CASE WHEN asplit <> bsplit THEN 1 ELSE 0 END AS x FROM ej
       |    UNION ALL SELECT bsplit, blang,
       |           CASE WHEN asplit <> bsplit THEN 1 ELSE 0 END FROM ej) u
       |  GROUP BY split, lang)
       |SELECT b.split, b.lang, b.n_docs, b.n_tokens, b.n_chunks,
       |       CAST(coalesce(l.cross_edges, 0) AS BIGINT) AS cross_edges
       |FROM base b LEFT JOIN lk l ON l.split = b.split AND l.lang = b.lang
       |ORDER BY b.split, b.lang""".stripMargin) { (spark, dir) =>
    val nStop = expr(
      s"size(filter(split(text, ' '), x -> x IN $stopList))")
    val feat = docs(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), " ")).as("n_words"),
        length(col("text")).as("n_chars"), nStop.as("n_stop"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))).as("n_digit"))
    val qf = feat.where(col("n_words") >= 20 &&
      col("n_stop").cast("double") / col("n_words") >= 0.01 &&
      col("n_digit").cast("double") / col("n_chars") < 0.3)
    val byHash = Window.partitionBy(md5(col("text").cast("binary")))
    // checkpointed (optimization round 19, the q18_prep_pipeline fix):
    // `ex` feeds both the language counts and the rebalance filter —
    // without the barrier the scan + quality filter + md5-dedup window
    // lineage ran twice per execution; three narrow columns per
    // surviving doc
    val ex = qf
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(byHash))
      .where(col("keep"))
      .select(col("doc_id"), col("lang"), col("n_words"))
      .localCheckpoint()
    val lc = ex.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val tgt = lc.agg(min(col("n")).as("target"))
    val rb = ex
      .join(broadcast(lc), Seq("lang"))
      .crossJoin(broadcast(tgt))
      .where((col("doc_id").cast("decimal(38,0)") * lit(2654435761L)
        % lit(1048576L)) * col("n") <
        col("target").cast("decimal(38,0)") * lit(1048576L))
    val h = substring(
      md5(coalesce(col("component"), col("doc_id")).cast("string").cast("binary")), 1, 2)
    // three consumers (pack rollup + both edge-endpoint joins) → one
    // eager checkpoint of the tiny assignment frame (the
    // q18_leakage_split precedent)
    val spl = rb
      .join(ccNodeMapCached(spark, dir), col("doc_id") === col("node"), "left")
      .select(col("doc_id"), col("lang"), col("n_words"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
      .localCheckpoint()
    val base = spl.transform(TextQueries.shardedCum(Seq("split", "lang")))
      .select(col("split"), col("lang"), col("n_words"),
        expr("(cum - n_words) div 512").as("chunk_id"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"),
        countDistinct(col("chunk_id")).as("n_chunks"))
    val e = lshCandidates(spark, dir, dupes = true)
    val ej = e
      .join(spl.select(col("doc_id").as("doc_a"),
        col("split").as("asplit"), col("lang").as("alang")), Seq("doc_a"))
      .join(spl.select(col("doc_id").as("doc_b"),
        col("split").as("bsplit"), col("lang").as("blang")), Seq("doc_b"))
    val lk = ej.select(explode(array(
        struct(col("asplit").as("split"), col("alang").as("lang"),
          (col("asplit") =!= col("bsplit")).cast("long").as("x")),
        struct(col("bsplit").as("split"), col("blang").as("lang"),
          (col("asplit") =!= col("bsplit")).cast("long").as("x")))).as("k"))
      .groupBy(col("k.split").as("split"), col("k.lang").as("lang"))
      .agg(sum(col("k.x")).as("cross_edges"))
    base.join(lk, Seq("split", "lang"), "left")
      .select(col("split"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_chunks"),
        coalesce(col("cross_edges"), lit(0L)).cast("long").as("cross_edges"))
      .orderBy(col("split"), col("lang"))
  }

  // ---- hybrid retrieval: reciprocal-rank fusion of the BM25 text
  //      arm and the dense cosine arm — how a production RAG /
  //      retrieval-eval stack actually ranks (sparse catches exact
  //      terms, dense catches paraphrase; RRF fuses without score
  //      calibration). Both arms reuse proven shapes verbatim: BM25 =
  //      q18_bm25's integer micro-unit scoring off the session doc-
  //      term matrix (three-term query, same constants); dense =
  //      q18_cosine_topk's broadcast-probe codegen dot (probe vec 0).
  //      Each arm takes its top-100 via TakeOrdered (no global sort),
  //      then ranks are assigned WITHOUT any window: a 100×100
  //      broadcast theta-join counts strictly-better rows — constant
  //      work, so the no-unpartitioned-window invariant
  //      (PlanShapeSpec) holds at any corpus size. Fusion is a
  //      full-outer join of two ≤100-row frames keyed on the aligned
  //      doc/vec id space; rrf_um = Σ 1e6 div (60 + rank) in exact
  //      integers (absent arm contributes 0). At 100 TB the arms'
  //      costs are their standalone queries'; the fusion is O(K). ----
  val q18HybridRrf: QueryDef = QueryDef(
    "q18_hybrid_rrf",
    s"""WITH $quantSql,
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |corp AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
       |qt AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok
       |       WHERE w IN ('table', 'stream', 'query') GROUP BY w),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
       |       WHERE w IN ('table', 'stream', 'query') GROUP BY doc_id, w),
       |contrib AS (
       |  SELECT tf.doc_id, tf.w,
       |         CAST(round(1000000
       |           * ln(1 + (n_docs - df + 0.5) / (df + 0.5))
       |           * (tf * 2.2)
       |           / (tf + 1.2 * (0.25 + 0.75 * dl.dl * n_docs
       |                                 / CAST(tot_dl AS DOUBLE)))) AS BIGINT) AS s_um
       |  FROM tf JOIN qt ON tf.w = qt.w
       |          JOIN dl ON tf.doc_id = dl.doc_id
       |          CROSS JOIN corp),
       |bm AS (SELECT doc_id, CAST(sum(s_um) AS BIGINT) AS bm25_um
       |       FROM contrib GROUP BY doc_id),
       |ttop AS (SELECT doc_id, rt FROM (
       |  SELECT doc_id, row_number() OVER (ORDER BY bm25_um DESC, doc_id) AS rt
       |  FROM bm) WHERE rt <= 100),
       |vsc AS (
       |  SELECT c.vec_id,
       |         CAST(${dotQSql("p.q", "c.q")} AS DOUBLE)
       |           / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cosine
       |  FROM qn p JOIN qn c ON p.vec_id = 0 AND c.vec_id <> 0),
       |vtop AS (SELECT vec_id, rv FROM (
       |  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS rv
       |  FROM vsc) WHERE rv <= 100),
       |fused AS (
       |  SELECT coalesce(t.doc_id, v.vec_id) AS id,
       |         CAST(coalesce(t.rt, 0) AS BIGINT) AS r_text,
       |         CAST(coalesce(v.rv, 0) AS BIGINT) AS r_vec,
       |         CAST(coalesce(1000000 // (60 + t.rt), 0)
       |            + coalesce(1000000 // (60 + v.rv), 0) AS BIGINT) AS rrf_um
       |  FROM ttop t FULL OUTER JOIN vtop v ON v.vec_id = t.doc_id)
       |SELECT id, r_text, r_vec, rrf_um
       |FROM fused ORDER BY rrf_um DESC, id LIMIT 20""".stripMargin) { (spark, dir) =>
    // rank without a window: count strictly-better rows in the ≤K-row
    // top list via a broadcast theta-join (K² = 10k comparisons)
    def rankBy(top: DataFrame, id: String, score: Column,
        better: Column, out: String): DataFrame = {
      val o = top.select(col(id).as("__o_id"), score.as("__o_s"))
      top.join(broadcast(o), better, "left")
        .groupBy(col(id))
        .agg((count(col("__o_id")) + 1).cast("long").as(out))
    }
    // text arm — q18_bm25's scoring verbatim, top-100
    val tfAll = TextQueries.termFreq(spark, dir)
    val dl = tfAll.groupBy(col("doc_id")).agg(sum(col("tf")).cast("long").as("dl"))
    val corp = dl.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("tot_dl"))
    val qtf = tfAll.where(col("w").isin("table", "stream", "query"))
    val qt = qtf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val bm = qtf.select(col("doc_id"), col("w"), col("tf"))
      .join(broadcast(qt), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corp))
      .select(col("doc_id"), expr(
        """CAST(round(1000000
          |  * ln(1 + (n_docs - df + 0.5) / (df + 0.5))
          |  * (tf * 2.2)
          |  / (tf + 1.2 * (0.25 + 0.75 * dl * n_docs
          |                        / CAST(tot_dl AS DOUBLE)))) AS BIGINT)""".stripMargin)
        .as("s_um"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s_um")).cast("long").as("bm25_um"))
    // dense arm — q18_cosine_topk's broadcast-probe dot, probe vec 0
    val qn = quantized(embs(spark, dir))
    val probe = qn.where(col("vec_id") === 0)
      .select(col("q").as("qp"), col("n2").as("n2p"))
    val cosine = dotQ("qp", "qc").cast("double") /
      (sqrt(col("n2p").cast("double")) * sqrt(col("n2c").cast("double")))
    val vsc = qn.where(col("vec_id") =!= 0)
      .select(col("vec_id"), col("q").as("qc"), col("n2").as("n2c"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine.as("cosine"))
    // the two arm top-100 checkpoints share no lineage (text arm reads
    // the doc-term matrix, dense arm the embeddings) but used to
    // materialize back-to-back — two sequential job waves. Overlapped
    // on driver threads (optimization round 20, guide §2.6; see
    // ScaleOps.checkpointConcurrently for the determinism/lifecycle
    // argument and ConcurrentCheckpointSpec for the pin).
    val Seq(ttop, vtop) = ScaleOps.checkpointConcurrently(Seq(
      bm.orderBy(col("bm25_um").desc, col("doc_id")).limit(100),
      vsc.orderBy(col("cosine").desc, col("vec_id")).limit(100)))
    val rankT = rankBy(ttop, "doc_id", col("bm25_um"),
      col("__o_s") > col("bm25_um") ||
        (col("__o_s") === col("bm25_um") && col("__o_id") < col("doc_id")), "rt")
    val rankV = rankBy(vtop, "vec_id", col("cosine"),
      col("__o_s") > col("cosine") ||
        (col("__o_s") === col("cosine") && col("__o_id") < col("vec_id")), "rv")
    // fusion over the aligned id space
    rankT.select(col("doc_id").as("tid"), col("rt"))
      .join(rankV.select(col("vec_id").as("vid"), col("rv")),
        col("tid") === col("vid"), "full_outer")
      .select(coalesce(col("tid"), col("vid")).as("id"),
        coalesce(col("rt"), lit(0L)).as("r_text"),
        coalesce(col("rv"), lit(0L)).as("r_vec"),
        (coalesce(expr("1000000 div (60 + rt)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rv)"), lit(0L))).cast("long").as("rrf_um"))
      .orderBy(col("rrf_um").desc, col("id")).limit(20)
  }

  val all: Seq[QueryDef] = Seq(
    q18DedupExact, q18MinhashSig, q18MinhashPairs, q18Simhash, q18SimhashPairs,
    q18NgramJaccard, q18CosineTopK, q18AnnLsh, q18AnnIvf, q18AnnIvfPq, q18Novelty, q18Triplets, q18DedupEmbed,
    q18DedupResolve, q18ResolveQuality, q18CleanCorpus, q18CcDedup, q18KnnGraph, q18Centroids,
    q18Pagerank, q18EditDedup, q18TfidfSim, q18AnnRecall, q18MinhashQuality,
    q18SimhashQuality, q18Containment, q18FuzzyContam, q18DupStats,
    q18KnnClassify, q18Triangles, q18LeakageSplit, q18PrepPipelineV2,
    q18HybridRrf, q18EmbedDrift)
}
