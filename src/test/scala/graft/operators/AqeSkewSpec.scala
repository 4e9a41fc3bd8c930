package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime half of the engine's skew
  * story (the compile-time half is ScaleOps.saltedJoin/saltedAgg,
  * oracle-checked as q20_salted_*): a sort-merge join whose hot key
  * concentrates ~90% of one side must be split by AQE's
  * OptimizeSkewedJoin at runtime, with results identical to the
  * unsplit join. This pins the claim in COVERAGE.md that AQE is a
  * load-bearing part of the scale path, not just a flag. */
class AqeSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-aqeskew-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // force a sort-merge join (no broadcast escape hatch)…
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // …and thresholds small enough that the hot key's partition
      // (~90% of ~6 MB) counts as skewed at test scale
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16384")

      import spark.implicits._
      // hot key 0 carries 90% of the left side
      val left = spark.range(0, 400000)
        .select(when(col("id") % 10 === 0, col("id")).otherwise(0L).as("k"),
          col("id").as("v"),
          concat(lit("pad-pad-pad-pad-pad-"), col("id")).as("pad"))
      val right = spark.range(0, 50000).select(col("id").as("k"),
        (col("id") * 2).as("w"))

      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val row = joined.collect().head
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("skew=true"), plan.take(3000))
      // identical result with skew handling off
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
        .collect().head
      assert(row == plain)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
