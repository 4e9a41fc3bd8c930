package graft

import org.apache.spark.sql.SparkSession

/** Above-the-gate drive of the cc local-finish handoff (SCALING.md
  * round-12): on a fixture with a planted mega-duplicate cluster
  * (tools/make_megadup.py) whose symmetrized edge set exceeds the
  * 2M-edge default `spark.graft.cc.localFinishEdges`, runs
  * q18_cc_dedup twice —
  *
  *  1. DEFAULT gate: the distributed star-contraction loop must run
  *     real rounds (visible via SPARK_GRAFT_DEBUG's `[graft.cc]`
  *     stderr line: `localFinish=... edges=...`) before the shrunken
  *     graph hands off to the one-task union-find;
  *  2. gate = Long.MaxValue in a FRESH session (SessionCache keys by
  *     session reference, so run 1's cached component map is not
  *     reused): the pure local union-find over the full edge set.
  *
  * and asserts the two cluster frames are IDENTICAL — the
  * local==distributed equivalence ConnectedComponentsSpec pins at
  * unit scale, exercised above the gate at tier scale — plus the
  * analytic shape of the planted cluster (one component of
  * ≥ n_copies members; the base corpus' cluster histogram otherwise
  * unchanged in count). Prints one timing line per run.
  *
  * Run: SPARK_GRAFT_DEBUG=1 sbt "runMain graft.ProfileCcGate <dir> <n_copies>"
  */
object ProfileCcGate {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCopies = args(1).toLong
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-cc-gate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(s: SparkSession, label: String): (Double, Array[(Long, Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.SimilarityQueries.q18CcDedup.build(s, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-24s ${dt}%8.2f s   clusters=${rows.length}")
      (dt, rows)
    }

    // run 1: default gate — the mega cluster's edges exceed it, so the
    // distributed loop runs rounds then hands off
    val (_, distributed) = run(spark, "contract_then_finish")

    // run 2: local-only baseline in a fresh session (gate = MaxValue)
    val local = spark.newSession()
    local.conf.set("spark.graft.cc.localFinishEdges", Long.MaxValue.toString)
    val (_, localRows) = run(local, "local_union_find")

    require(distributed.toSet == localRows.toSet,
      s"distributed and local component frames differ: " +
        s"${distributed.length} vs ${localRows.length} clusters")
    val mega = distributed.maxBy(_._2)
    require(mega._2 >= nCopies,
      s"planted mega cluster missing: largest component has ${mega._2} members, " +
        s"expected >= $nCopies")
    println(s"mega cluster: component=${mega._1} n_members=${mega._2}")
    println("equivalence: distributed == local over " +
      s"${distributed.length} clusters OK")
    spark.stop()
  }
}
