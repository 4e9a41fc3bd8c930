package graft

import graft.model.Envelope
import graft.streaming.{AnnIndexStore, AnnServeGate}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver for tools/ann_crash_drive.sh — the AnnIndexStore analogue of
  * the CheckpointStore crash gate (SCALING.md round-14 follow-up 2):
  * in-process Runtime.halt kills at the refresh protocol's exact
  * windows (`ann-pre-swap`, `ann-pre-gc`, `ann-mid-gc`, via
  * [[graft.streaming.CrashPoint]]) while a SEPARATE serving JVM keeps
  * answering probes against the same index dir. The gate asserts every
  * served answer across build → refresh → kill → remediate → resume
  * equals one of the two COLD-REBUILD sides, and the final state equals
  * the cold rebuild of the last corpus — i.e. a crash at any protocol
  * instant can lose at most the uncommitted refresh, never an answer.
  *
  * Subcommands (corpus slices mirror AnnIndexRefreshSpec: `base` =
  * even labels of the fixture's embeddings, `grown` = all):
  *
  *   cold <sfDir> <slice>              print COLD <md5> of a direct
  *                                     ivfIndexOf+serve on the slice
  *   refresh <sfDir> <indexDir> <slice>  refresh the store (the crash
  *                                     env may halt the JVM inside)
  *   serve <sfDir> <indexDir>          print SERVE <md5> once
  *   serve-loop <sfDir> <indexDir> <stopFile>  serve every ~300 ms
  *                                     until stopFile appears, printing
  *                                     SERVE/ERROR lines
  */
object AnnCrashDrive {

  private def embs(spark: SparkSession, dir: String, slice: String): DataFrame = {
    val all = Envelope.readTable(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    slice match {
      case "base" => all.where(col("label") % 2 === 0)
      case "grown" => all
      case other => throw new IllegalArgumentException(s"unknown slice '$other'")
    }
  }

  private def probes(spark: SparkSession, dir: String): DataFrame =
    Envelope.readTable(spark, dir, "embeddings")
      .where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))

  /** Deterministic digest of a served result (qid, rnk, cand_id,
    * dot_s rows — bounded: |probes| × k). */
  private def digest(r: DataFrame): String = {
    val lines = r.collect().map { row =>
      s"${row.getAs[Long]("qid")}:${row.getAs[Int]("rnk")}:" +
        s"${row.getAs[Long]("cand_id")}:${row.getAs[Long]("dot_s")}"
    }.sorted.mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(lines.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "cold" :: sfDir :: slice :: Nil => withSpark { spark =>
      val (qn, cent) = graft.operators.SimilarityQueries.ivfIndexOf(embs(spark, sfDir, slice))
      println(s"COLD ${digest(AnnServeGate.serve(probes(spark, sfDir), qn, cent, k = 3))}")
    }
    case "refresh" :: sfDir :: indexDir :: slice :: Nil => withSpark { spark =>
      val v = AnnIndexStore.refresh(spark, embs(spark, sfDir, slice), indexDir)
      println(s"REFRESHED $v")
    }
    case "serve" :: sfDir :: indexDir :: Nil => withSpark { spark =>
      println(s"SERVE ${digest(AnnIndexStore.serveCurrent(spark, probes(spark, sfDir), indexDir, k = 3))}")
    }
    case "serve-loop" :: sfDir :: indexDir :: stopFile :: Nil => withSpark { spark =>
      val pr = probes(spark, sfDir).localCheckpoint()
      var n = 0
      while (!java.nio.file.Files.exists(java.nio.file.Paths.get(stopFile)) && n < 2000) {
        try println(s"SERVE ${digest(AnnIndexStore.serveCurrent(spark, pr, indexDir, k = 3))}")
        catch { case e: Throwable =>
          println(s"ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
        }
        Console.out.flush()
        n += 1
        Thread.sleep(300L)
      }
      println(s"DONE $n")
    }
    case other =>
      System.err.println(s"usage: cold|refresh|serve|serve-loop ... (got $other)")
      sys.exit(2)
  }

  private def withSpark[A](f: SparkSession => A): A = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-ann-crash-drive")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try f(spark) finally spark.stop()
  }
}
