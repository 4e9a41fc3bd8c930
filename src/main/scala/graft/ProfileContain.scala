package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase profiler for q18_containment (the round-11 suite's slowest
  * query at sf0.1): times the corpus shingle materialization, the DF
  * aggregate, the rare-shingle pick, the candidate self-join, and the
  * exact confirm separately so optimization targets the measured
  * phase, not the guessed one. Mirrors the query's plan shape
  * (SimilarityQueries.q18Containment) with the private helpers
  * inlined. */
object ProfileContain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-contain")
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

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def shingledRaw = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
          .as("shingle"))

    // p1: corpus shingle scan + distinct (no checkpoint)
    time("p1_shingle_distinct") { shingledRaw.distinct().count() }

    // p2: the same, materialized through localCheckpoint (the query's
    // actual first phase) — measures the serialization premium
    var sh = shingledRaw.distinct().localCheckpoint()
    time("p2_checkpoint_build") {
      val s = shingledRaw.distinct().localCheckpoint(); s.count()
    }

    // p3: DF aggregate off the checkpointed frame
    time("p3_dfq") {
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("df")).count()
    }

    // p4: rare-shingle pick (join + per-doc window top-4)
    val dfq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    def pick = sh.join(dfq.where(col("df").between(2, 64)), Seq("shingle"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .where(col("rn") <= 4)
      .select(col("doc_id"), col("shingle"))
    time("p4_pick") { pick.count() }

    // p5: candidate self-join on the picked shingles
    def cand = pick.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(pick.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    time("p5_cand") { cand.count() }

    // p6: exact confirm (semi-join prune + sizes + intersection)
    val candM = cand.localCheckpoint()
    time("p6_confirm") {
      val ids = candM.select(col("doc_a").as("doc_id"))
        .union(candM.select(col("doc_b").as("doc_id"))).distinct()
      val sh2 = sh.join(ids, Seq("doc_id"), "left_semi").distinct()
        .localCheckpoint()
      val sizes = sh2.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh2.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(sh2.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("both_n"))
      candM.join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .join(inter, Seq("doc_a", "doc_b"), "left").count()
    }

    // n-phases: the round-11 capped-aggregate plan
    def agg = shingledRaw
      .groupBy(col("shingle"))
      .agg(graft.functions.SetAgg.cappedDocSet(col("doc_id"), 64).as("ds"))
      .where(col("ds").isNotNull && size(col("ds")).between(2, 64))
    time("n1_capped_agg") { agg.count() }

    def pickN = agg
      .select(col("shingle"), size(col("ds")).cast("long").as("df"),
        explode(col("ds")).as("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .where(col("rn") <= 4)
      .select(col("doc_id"), col("shingle"))
    time("n2_pick") { pickN.count() }
    val pickM = pickN.localCheckpoint()
    time("n2b_pick_checkpoint") { pickN.localCheckpoint().count() }

    def candN = pickM.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(pickM.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    time("n3_cand") { candN.count() }

    val candM2 = candN.localCheckpoint()
    time("n4_confirm_docprune") {
      val ids = candM2.select(col("doc_a").as("doc_id"))
        .union(candM2.select(col("doc_b").as("doc_id"))).distinct()
      val sh2 = d.join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
            .as("shingle"))
        .distinct().localCheckpoint()
      val sizes = sh2.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh2.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(sh2.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("both_n"))
      candM2.join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .join(inter, Seq("doc_a", "doc_b"), "left").count()
    }

    // p7: the registered query end-to-end
    val q = graft.operators.SimilarityQueries.all
      .find(_.name == "q18_containment").get
    time("p7_full_query") { q.build(spark, sfDir).count() }

    spark.stop()
  }
}
