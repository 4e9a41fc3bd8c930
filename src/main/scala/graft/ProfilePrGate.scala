package graft

import org.apache.spark.sql.SparkSession

/** Above-the-gate drive of the PageRank local-finish handoff
  * (SCALING.md round-12): q18_pagerank rides the PAIR graph, so the
  * cc study's single verbatim mega-cluster would be quadratic by
  * construction — instead tools/make_megadup.py's multi-cluster mode
  * plants many MEDIUM clusters (bounded blocks, Σ C(|B|,2) edges
  * crossing the 2M-edge `spark.graft.pr.localEdges` default). Runs
  * the query twice —
  *
  *  1. DEFAULT gate: sym edges > 2M, so the three DISTRIBUTED
  *     integer rounds (9-shuffle plan) must run;
  *  2. gate = Long.MaxValue in a FRESH session: the one-task
  *     localPagerank over the full edge set;
  *
  * and asserts the two top-20 frames BIT-IDENTICAL — PageRank values
  * are exact integers (sums are commutative), so local==distributed
  * is an equality of longs, not a tolerance. Prints one timing line
  * per run plus the measured sym edge count.
  *
  * Run: sbt "runMain graft.ProfilePrGate <dir>"
  */
object ProfilePrGate {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-pr-gate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(s: SparkSession, label: String): (Double, Seq[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.SimilarityQueries.q18Pagerank.build(s, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-24s ${dt}%8.2f s   top=${rows.take(3)}")
      (dt, rows)
    }

    val (_, distributed) = run(spark, "pr_distributed")

    val local = spark.newSession()
    local.conf.set("spark.graft.pr.localEdges", Long.MaxValue.toString)
    val (_, localRows) = run(local, "pr_local_union")

    require(distributed == localRows,
      s"distributed and local top-20 differ:\n$distributed\nvs\n$localRows")
    println(s"equivalence: distributed == local top-20 (bit-exact longs) OK")
    spark.stop()
  }
}
