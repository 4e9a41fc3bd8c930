package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved same-boot A/B for q18_containment's rare-shingle pick
  * (optimization round 19): window row_number form vs sorted-slice
  * aggregate form, alternated within one JVM so ambient drift hits
  * both arms equally. */
object ProfilePickAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pick-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val agg = graft.operators.SimilarityQueries.docShingles(spark, sfDir)
      .groupBy(col("shingle"))
      .agg(graft.functions.SetAgg.cappedDocSet(col("doc_id"), 64).as("ds"))
      .where(col("ds").isNotNull && size(col("ds")).between(2, 64))
      .localCheckpoint()

    def winPick = agg
      .select(col("shingle"), size(col("ds")).cast("long").as("df"),
        explode(col("ds")).as("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .where(col("rn") <= 4)
      .select(col("doc_id"), col("shingle"))

    def aggPick = agg
      .select(struct(size(col("ds")).cast("long").as("df"), col("shingle")).as("p"),
        explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(slice(sort_array(collect_list(col("p"))), 1, 4).as("ps"))
      .select(col("doc_id"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("p.shingle").as("shingle"))

    // sanity: identical rows
    val d1 = winPick.exceptAll(aggPick).count()
    val d2 = aggPick.exceptAll(winPick).count()
    println(s"diff win-agg=$d1 agg-win=$d2")

    val wins = collection.mutable.ArrayBuffer.empty[Double]
    val aggs = collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 until 5) {
      var t0 = System.nanoTime(); winPick.localCheckpoint().count()
      wins += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); aggPick.localCheckpoint().count()
      aggs += (System.nanoTime() - t0) / 1e9
    }
    println(f"window pick: reps=${wins.map(x => f"$x%.3f").mkString(",")} min=${wins.min}%.3f")
    println(f"agg    pick: reps=${aggs.map(x => f"$x%.3f").mkString(",")} min=${aggs.min}%.3f")
    spark.stop()
  }
}
