package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level profiler for a named query (optimization round 19): runs
  * the query REPS times under the bench's session config and prints,
  * for the LAST rep, every Spark job with its wall time and first-line
  * call site — the attribution the r19 optimization needs (a query's
  * seconds at sf0.1 are a sum of sequential jobs: localCheckpoint
  * materializations, broadcast builds, AQE stage waves, the final
  * count), so optimization can target the measured job, not the
  * guessed operator.
  *
  * Usage: ProfileJobs [query ...]   (env SPARK_GRAFT_SF_DIR, _CPUS)
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus,2]")
      .appName("graft-profile-jobs")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    // cross-thread flag: written by the driver thread, read on the
    // listener-bus thread (ADVICE r19 - a plain var can miss a write)
    val collecting = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (collecting.get) {
        val site = js.stageInfos.map(_.name.takeWhile(_ != ':')).distinct.mkString("|")
        jobs.put(js.jobId, (System.nanoTime(), site, js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (collecting.get) {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site, nStages) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1e9, site, nStages))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collecting.get) {
        stageTasks.put(sc.stageInfo.stageId,
          (sc.stageInfo.numTasks, sc.stageInfo.taskMetrics.executorRunTime))
      }
    })

    // warm the session caches (wide copies, derived frames) once, like
    // the bench preamble, so job attribution reflects steady state
    for (t <- Seq("documents", "embeddings", "events", "lineitem"))
      graft.operators.ScaleOps.wideRead(spark, sfDir, t)
    graft.operators.SimilarityQueries.docShingles(spark, sfDir)
    graft.operators.TextQueries.hllShingles(spark, sfDir)

    val names = if (args.nonEmpty) args.toSeq else Seq("q18_containment")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (r <- 0 until reps) {
        if (r == reps - 1) { done.clear(); jobs.clear(); collecting.set(true) }
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        // mirror Dataset.count() but keep the QueryExecution so the
        // Catalyst phase timings (analysis/optimization/planning) of
        // THIS execution are readable afterwards
        val cnt = df.groupBy().count()
        cnt.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        if (r == reps - 1) {
          collecting.set(false)
          Thread.sleep(200) // let listener drain
          val ph = cnt.queryExecution.tracker.phases
            .map { case (k, v) => f"$k=${(v.endTimeMs - v.startTimeMs) / 1e3}%.3f" }
            .mkString(" ")
          println(f"\n===== $name rep$r total ${dt}%.3f s (build ${tBuild}%.3f s; $ph) =====")
          val ds = done.toArray(Array.empty[(Int, Double, String, Int)]).sortBy(_._1)
          for ((id, secs, site, nStages) <- ds)
            println(f"  job $id%3d ${secs}%7.3f s  stages=$nStages%2d  $site")
          println(f"  jobs-sum ${ds.map(_._2).sum}%.3f s over ${ds.length} jobs")
        }
      }
    }
    spark.stop()
  }
}
