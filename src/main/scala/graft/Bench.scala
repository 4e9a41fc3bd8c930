package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * A short untimed warmup absorbs JVM/codegen startup so the per-query
  * numbers measure the plans, not JIT. AQE is on (as it would be on a
  * cluster): skew splits and partition coalescing are part of the
  * engine's scale story.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise codegen/shuffle once
    SparkEntry.queries.get("q06_stream_hwm").foreach(f => f(spark, sfDir).count())
    SparkEntry.queries.get("q12_agg").foreach(f => f(spark, sfDir).count())

    // A failing query must not masquerade as a fast run: its time is
    // reported as -1 and the error surfaces in an `errors` map.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (err.isEmpty) sec else -1.0, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200) + "\""
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
