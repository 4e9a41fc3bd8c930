package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the optimization-round-20 operator-internal rewrites. Each
  * test compares the shipped (rewritten) path against the PRE-rewrite
  * construction rebuilt inline, so equivalence claims in
  * OPTIMIZATION_r20.md are executable:
  *
  *  - unscaled-long money kernels (q13_topk, q11_join) vs the original
  *    decimal(20,4) chains on the real sf0.001 fixture;
  *  - ScaleOps.checkpointConcurrently vs sequential localCheckpoint,
  *    plus the failure path (an arm's exception must propagate).
  */
class OptimizedKernelsR20Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-optkernels-r20-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private def dec(c: String) = expr(s"CAST($c AS DECIMAL(20,4))")

  test("q13_topk long kernel == original decimal chain") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val oldForm = li
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"),
        (round(col("rev_dec"), 2) * 100).cast("long").as("revenue_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val newForm = SparkEntry.queries("q13_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(newForm == oldForm)
  }

  test("q11_join long kernel + key-lifted segment == original decimal/first form") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_orderstatus") === "O")
    val oldForm = li
      .join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(
        (round(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))), 2) * 100)
          .cast("long").as("revenue_cents"),
        first(col("c_mktsegment")).as("segment"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val newForm = SparkEntry.queries("q11_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(newForm == oldForm)
  }

  test("checkpointConcurrently == sequential localCheckpoint; errors propagate") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("x").groupBy().agg(sum(col("x")).as("s"))
    val b = Seq(10L, 20L).toDF("y").select(col("y") * 2 as "y2")
    val Seq(ca, cb) = ScaleOps.checkpointConcurrently(Seq(a, b))
    assert(ca.collect().map(_.getLong(0)).toSeq == a.collect().map(_.getLong(0)).toSeq)
    assert(cb.collect().map(_.getLong(0)).sorted.toSeq ==
      b.collect().map(_.getLong(0)).sorted.toSeq)
    val boom = Seq(1, 0).toDF("d").select(expr("assert_true(d > 0)").as("z"))
    val ex = intercept[Throwable] {
      ScaleOps.checkpointConcurrently(Seq(a, boom))
    }
    assert(ex != null)
  }
}
