package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase profiler for q18_quality_calib's 10× blowup (SCALING.md round-6
  * OPEN item): times each sub-plan of the query in isolation so the
  * guilty phase is measured, not guessed. Run with
  * SPARK_GRAFT_SF_DIR=<dir> — prints one line per phase (median of 3).
  */
object ProfileCalib {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-calib")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.model.Envelope.readTable(spark, sfDir, "documents")

    def time(name: String)(f: => Long): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"$name%-28s ${med}%8.2f s   (rows=${ts.head._2})")
    }

    // P0: bare scan (IO floor)
    time("p0_scan_count") { docs.count() }
    // P1: split + size only (token pass without the lambda)
    time("p1_split_size") {
      docs.select(size(split(col("text"), " ")).as("nw"))
        .agg(sum(col("nw"))).collect().head.getLong(0)
    }
    // P2: the full score expression (split twice + HOF filter + IN)
    val s = docs.select(col("source"), expr(
      """(1000 * size(filter(split(text, ' '),
        |              w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))))
        | div size(split(text, ' '))""".stripMargin).as("score"))
    time("p2_score_pass") {
      s.agg(sum(col("score"))).collect().head.getLong(0)
    }
    // P3: histogram groupBy
    val h = s.groupBy(col("source"), col("score")).agg(count(lit(1)).as("c"))
    time("p3_histogram") { h.count() }
    // P4: cumulative windows over the histogram
    val byScoreDesc = Window.partitionBy(col("source")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bySource = Window.partitionBy(col("source"))
    val cum = h
      .withColumn("cge", sum(col("c")).over(byScoreDesc).cast("long"))
      .withColumn("n", sum(col("c")).over(bySource).cast("long"))
    time("p4_cum_windows") {
      cum.agg(sum(col("cge"))).collect().head.getLong(0)
    }
    // P5: threshold build
    val thr = cum.where(lit(2) * col("cge") >= col("n"))
      .groupBy(col("source")).agg(max(col("score")).as("t"))
      .select(col("source").as("t_source"), col("t"))
    time("p5_thr") { thr.count() }
    // P6: the full query as registered
    time("p6_full_query") {
      graft.operators.CurationQueries.q18QualityCalib.build(spark, sfDir).count()
    }
    // P7: full query but with the histogram materialized once (cache)
    time("p7_full_h_cached") {
      val hc = h.localCheckpoint()
      val cum2 = hc
        .withColumn("cge", sum(col("c")).over(byScoreDesc).cast("long"))
        .withColumn("n", sum(col("c")).over(bySource).cast("long"))
      val thr2 = cum2.where(lit(2) * col("cge") >= col("n"))
        .groupBy(col("source")).agg(max(col("score")).as("t"))
        .select(col("source").as("t_source"), col("t"))
      val out = cum2.join(broadcast(thr2),
          col("source") === col("t_source") && col("score") === col("t"))
        .select(col("source"), col("n").as("n_docs"), col("t").as("threshold_pm"),
          col("cge").as("n_kept"))
        .orderBy(col("source")).count()
      out
    }
    spark.stop()
  }
}
