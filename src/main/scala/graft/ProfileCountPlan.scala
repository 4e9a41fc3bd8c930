package graft

import org.apache.spark.sql.SparkSession

/** Sanity probe (optimization round 19): what does the bench's timed
  * action — `fn(spark, dir).count()` — actually execute? Prints the
  * optimized plan of `df.groupBy().count()` for the named queries so
  * we can confirm final ORDER BYs (range exchanges) are elided under
  * the count and the bench times computation, not presentation order.
  */
object ProfileCountPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-count-plan")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q13_topk", "q11_join")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val cnt = df.groupBy().count()
      val plan = cnt.queryExecution.executedPlan.toString
      val sorts = "(?i)sort".r.findAllIn(plan).size
      val range = "rangepartitioning".r.findAllIn(plan).size
      val exch = "Exchange".r.findAllIn(plan).size
      println(s"== $n: count-plan Sort*=$sorts rangepart=$range Exchange=$exch")
    }
    spark.stop()
  }
}
