package graft.operators

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

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Envelope.readTable(spark, dir, "documents")

  private def embs(spark: SparkSession, dir: String): DataFrame =
    Envelope.readTable(spark, dir, "embeddings")

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

  /** Spark-side shingle set: word 3-grams. */
  private def shingled(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
          .as("shingle"))

  private def minhashes(d: DataFrame): DataFrame =
    shingled(d)
      .select(col("doc_id"), explode(expr("sequence(0, 7)")).as("j"), col("shingle"))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(md5(concat(col("j"), lit(":"), col("shingle")))).as("h"))

  private def bandBuckets(d: DataFrame): DataFrame =
    minhashes(d)
      .groupBy(col("doc_id"), (col("j") / 2).cast("int").as("band"))
      .agg(md5(concat_ws("|",
        min(when(col("j") % 2 === 0, col("h"))),
        min(when(col("j") % 2 === 1, col("h"))))).as("bucket"))

  private val minhashSql =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |       FROM w, unnest(range(1, len(ws)-1)) AS t(i)),
      |mh AS (SELECT doc_id, j, min(md5(j || ':' || shingle)) AS h
      |       FROM sh, unnest(range(0, 8)) AS s(j) GROUP BY doc_id, j),
      |bands AS (
      |  SELECT doc_id, CAST(j // 2 AS INT) AS band,
      |         md5(min(CASE WHEN j % 2 = 0 THEN h END) || '|' ||
      |             min(CASE WHEN j % 2 = 1 THEN h END)) AS bucket
      |  FROM mh GROUP BY doc_id, j // 2)""".stripMargin

  val q18MinhashSig: QueryDef = QueryDef(
    "q18_minhash_sig",
    s"""WITH $minhashSql
       |SELECT doc_id, band, bucket FROM bands
       |WHERE doc_id % 20 = 0
       |ORDER BY doc_id, band""".stripMargin) { (spark, dir) =>
    bandBuckets(docs(spark, dir))
      .where(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("band"), col("bucket"))
      .orderBy(col("doc_id"), col("band"))
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
    val b = bandBuckets(docs(spark, dir))
    val a2 = b.select(col("doc_id").as("doc_b"), col("band"), col("bucket"))
    b.select(col("doc_id").as("doc_a"), col("band"), col("bucket"))
      .join(a2, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("band")).as("shared_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- SimHash: 32-bit signature from word votes; bit i comes from
  //      the i-th hex digit of md5(word) (high digit → +1) ----
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
    docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), explode(expr("sequence(0, 31)")).as("bit"), col("w"))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(when(
        expr("instr('89abcdef', substring(md5(w), bit + 1, 1))") > 0, 1)
        .otherwise(-1)).as("v"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(bit, IF(v > 0, '1', '0') AS c))), x -> x.c), '')")
        .as("simhash"))
      .orderBy(col("doc_id"))
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

  // ---- brute-force cosine top-k (ANN baseline) ----

  /** Scaled-integer dot product of two float arrays — order-independent,
    * bit-identical across engines. Stays inside codegen (no UDF). */
  private def dotScaled(a: String, b: String): Column = expr(
    s"""aggregate(
       |  zip_with($a, $b,
       |    (x, y) -> CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)),
       |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin)

  private val dotScaledSql =
    // DuckDB twin of dotScaled (1-based list indexing)
    (a: String, b: String) =>
      s"""CAST(list_sum(list_transform(range(1, len($a) + 1),
         |  i -> CAST(round(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) * 1e12) AS BIGINT)))
         |  AS BIGINT)""".stripMargin

  val q18CosineTopK: QueryDef = QueryDef(
    "q18_cosine_topk",
    s"""WITH norms AS (
       |  SELECT vec_id, embedding,
       |         ${dotScaledSql("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |pairs AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |         ${dotScaledSql("p.embedding", "c.embedding")} AS dot_s,
       |         p.nrm AS nrm_p, c.nrm AS nrm_c
       |  FROM norms p JOIN norms c ON p.vec_id < 5 AND p.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT probe_id, cand_id,
       |         CAST(dot_s AS DOUBLE) / (sqrt(CAST(nrm_p AS DOUBLE)) * sqrt(CAST(nrm_c AS DOUBLE)))
       |           AS cosine,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY dot_s * 1.0 / (sqrt(CAST(nrm_p AS DOUBLE)) * sqrt(CAST(nrm_c AS DOUBLE))) DESC,
       |                            cand_id) AS rnk
       |  FROM pairs)
       |SELECT probe_id, cand_id, cosine, rnk FROM scored
       |WHERE rnk <= 3
       |ORDER BY probe_id, rnk""".stripMargin) { (spark, dir) =>
    val norms = embs(spark, dir)
      .select(col("vec_id"), col("embedding"),
        dotScaled("embedding", "embedding").as("nrm"))
    val probes = norms.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("nrm").as("nrm_p"))
    val cands = norms
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("nrm").as("nrm_c"))
    val cosine = dotScaled("pe", "ce").cast("double") /
      (sqrt(col("nrm_p").cast("double")) * sqrt(col("nrm_c").cast("double")))
    val byProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    probes.join(cands, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"), cosine.as("cosine"))
      .withColumn("rnk", row_number().over(byProbe))
      .where(col("rnk") <= 3)
      .orderBy(col("probe_id"), col("rnk"))
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

  private def lshSig(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"), col("x"), explode(expr("sequence(0, 15)")).as("j"))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(when(
        expr("instr('89abcdef', substring(md5(concat(j, ':', d)), 1, 1))") > 0,
        expr("CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)"))
        .otherwise(expr("-CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)"))).as("s"))
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
    lshSig(embs(spark, dir))
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
    """WITH dims AS (
      |  SELECT vec_id, label, i - 1 AS d,
      |         CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS x
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
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
      |         CAST(list_sum(list_transform(range(1, len(p.embedding) + 1),
      |           i -> CAST(round(CAST(p.embedding[i] AS DOUBLE)
      |                           * CAST(c.embedding[i] AS DOUBLE) * 1e12) AS BIGINT)))
      |           AS BIGINT) AS dot_s
      |  FROM routed r
      |  JOIN embeddings p ON p.vec_id = r.probe_id
      |  JOIN embeddings c ON c.label = r.probe_label AND c.vec_id <> r.probe_id)
      |SELECT probe_id, probe_label, cand_id, dot_s, rnk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY probe_id
      |                               ORDER BY dot_s DESC, cand_id) AS rnk
      |  FROM pairs) f
      |WHERE rnk <= 3
      |ORDER BY probe_id, rnk""".stripMargin) { (spark, dir) =>
    val e = embs(spark, dir)
    val dims = e
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .withColumn("x", expr("CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT)"))
    val cent = dims.groupBy(col("label"), col("d"))
      .agg(expr("CAST(round(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)").as("cx"))
      .select(col("label").as("c_label"), col("d"), col("cx"))
    val probeDist = dims.where(col("vec_id") < 5)
      .join(broadcast(cent), Seq("d"))
      .groupBy(col("vec_id"), col("c_label"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).cast("long").as("dist2"))
    val byProbe = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("c_label"))
    val routed = probeDist.withColumn("rn", row_number().over(byProbe))
      .where(col("rn") === 1)
      .select(col("vec_id").as("probe_id"), col("c_label").as("probe_label"))
    val probes = e.select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val cands = e.select(col("vec_id").as("cand_id"), col("label").as("probe_label"),
      col("embedding").as("ce"))
    val rankW = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot_s").desc, col("cand_id"))
    broadcast(routed)
      .join(probes, Seq("probe_id"))
      .join(cands, Seq("probe_label"))
      .where(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("probe_label"), col("cand_id"),
        dotScaled("pe", "ce").cast("long").as("dot_s"))
      .withColumn("rnk", row_number().over(rankW))
      .where(col("rnk") <= 3)
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ---- embedding-cosine near-dup dedup, label-blocked: candidate
  //      pairs are generated only within a cluster block (the IVF
  //      partitioning), then the exact cosine threshold collapses each
  //      pair to the lower vec_id. The dot products run as a codegen'd
  //      explode + hash-aggregate (an interpreted higher-order-function
  //      dot is ~40µs/pair — 50× slower at corpus scale), with
  //      scaled-integer products so the sums stay order-independent. ----
  val q18DedupEmbed: QueryDef = QueryDef(
    "q18_dedup_embed",
    """WITH dims AS (
      |  SELECT vec_id, label, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |nrm AS (
      |  SELECT vec_id, CAST(sum(CAST(round(x * x * 1e12) AS BIGINT)) AS BIGINT) AS n2
      |  FROM dims GROUP BY vec_id),
      |dots AS (
      |  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
      |         CAST(sum(CAST(round(a.x * b.x * 1e12) AS BIGINT)) AS BIGINT) AS dot_s
      |  FROM dims a JOIN dims b
      |    ON a.label = b.label AND a.d = b.d AND a.vec_id < b.vec_id
      |  GROUP BY a.vec_id, b.vec_id)
      |SELECT keep_id, dup_id,
      |       CAST(dot_s AS DOUBLE)
      |         / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
      |FROM dots
      |JOIN nrm na ON na.vec_id = keep_id
      |JOIN nrm nb ON nb.vec_id = dup_id
      |WHERE CAST(dot_s AS DOUBLE)
      |        / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) > 0.35
      |ORDER BY keep_id, dup_id""".stripMargin) { (spark, dir) =>
    val dims = embs(spark, dir)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .withColumn("x", col("v").cast("double"))
    val nrm = dims.groupBy(col("vec_id"))
      .agg(sum(expr("CAST(round(x * x * 1e12) AS BIGINT)")).cast("long").as("n2"))
    val a = dims.select(col("label"), col("d"), col("vec_id").as("keep_id"),
      col("x").as("xa"))
    val b = dims.select(col("label"), col("d"), col("vec_id").as("dup_id"),
      col("x").as("xb"))
    val dots = a.join(b, Seq("label", "d"))
      .where(col("keep_id") < col("dup_id"))
      .groupBy(col("keep_id"), col("dup_id"))
      .agg(sum(expr("CAST(round(xa * xb * 1e12) AS BIGINT)")).cast("long").as("dot_s"))
    val cosine = col("dot_s").cast("double") /
      (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double")))
    dots
      .join(broadcast(nrm.select(col("vec_id").as("keep_id"), col("n2").as("n2_a"))),
        Seq("keep_id"))
      .join(broadcast(nrm.select(col("vec_id").as("dup_id"), col("n2").as("n2_b"))),
        Seq("dup_id"))
      .select(col("keep_id"), col("dup_id"), cosine.as("cosine"))
      .where(col("cosine") > 0.35)
      .orderBy(col("keep_id"), col("dup_id"))
  }

  val all: Seq[QueryDef] = Seq(
    q18DedupExact, q18MinhashSig, q18MinhashPairs, q18Simhash,
    q18NgramJaccard, q18CosineTopK, q18AnnLsh, q18AnnIvf, q18DedupEmbed)
}
