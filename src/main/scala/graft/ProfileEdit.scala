package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for q18_edit_dedup's non-monotonic scaling (round 7:
  * 43 s at 30× but 5.7 s at 60×): times the candidate build, the text
  * joins, and the banded levenshtein kernel separately. */
object ProfileEdit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-edit")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-26s ${ts.map(_._1).sorted.apply(1)}%8.2f s  (rows=${ts.head._2})")
    }

    val q = graft.operators.SimilarityQueries.all
      .find(_.name == "q18_edit_dedup").get

    // p1: full query (bandIndex warm after rep 1, like the bench)
    time("p1_full") { q.build(spark, sfDir).count() }

    // p2: the candidate set alone (cached band index by now)
    val pairs = graft.operators.SimilarityQueries.all
      .find(_.name == "q18_minhash_pairs").get
    time("p2_cand_pairs") { pairs.build(spark, sfDir).count() }

    // p3: join + length stats only, no levenshtein
    val d = graft.model.Envelope.readTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val cand = pairs.build(spark, sfDir).select(col("doc_a"), col("doc_b"))
    time("p3_joins_lengths") {
      cand
        .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
        .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
        .agg(sum(length(col("ta")) + length(col("tb"))).cast("long")).collect().head.getLong(0)
    }
    // p4: the banded kernel on the joined pairs
    val bound = "(401 * greatest(length(ta), length(tb)) - 1) div 1000"
    time("p4_lev_banded") {
      cand
        .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
        .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
        .where(expr(s"abs(length(ta) - length(tb)) <= $bound"))
        .select(expr(s"CAST(levenshtein(ta, tb, CAST($bound AS INT)) AS BIGINT)").as("lev"))
        .agg(sum(col("lev")).cast("long")).collect().head.getLong(0)
    }
    // p4h: the same kernel but with the text joins forced to shuffle
    // joins (the 100 TB shape — a billion-pair candidate set cannot
    // broadcast); the kernel stage width then comes from
    // shuffle.partitions, not the scan or AQE's broadcast choice
    time("p4h_lev_shuffle") {
      cand.hint("shuffle_hash")
        .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
        .hint("shuffle_hash")
        .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
        .where(expr(s"abs(length(ta) - length(tb)) <= $bound"))
        .select(expr(s"CAST(levenshtein(ta, tb, CAST($bound AS INT)) AS BIGINT)").as("lev"))
        .agg(sum(col("lev")).cast("long")).collect().head.getLong(0)
    }
    // final AQE plan of the plain p4 shape — which join strategy ran,
    // and where the kernel project sits
    val p4df = cand
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
      .where(expr(s"abs(length(ta) - length(tb)) <= $bound"))
      .select(expr(s"CAST(levenshtein(ta, tb, CAST($bound AS INT)) AS BIGINT)").as("lev"))
      .agg(sum(col("lev")).cast("long"))
    p4df.collect()
    println("p4 final plan:")
    println(p4df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("AQEShuffleRead"))
      .mkString("\n"))
    // p5: text length distribution of the pair set
    val lens = cand
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
      .select(greatest(length(col("ta")), length(col("tb"))).as("l"))
      .agg(count(lit(1)), avg(col("l")), max(col("l")),
        sum(expr("CAST(l AS BIGINT) * CAST(l AS BIGINT)")).cast("double"))
      .collect().head
    println(s"p5_pairs=${lens.getLong(0)} avg_len=${lens.getDouble(1).round} " +
      s"max_len=${lens.getLong(2)} sum_l2=${lens.getDouble(3)}")
    spark.stop()
  }
}
