package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The contract iterative checkpoint loops (BPE merge training, CC
  * star contraction) lean on: `withNewPersisted` captures exactly the
  * registry ids a localCheckpoint adds, and `unpersist` frees them —
  * so a k-round loop holds one cached copy, not k.
  */
class CacheHygieneSpec extends AnyFunSuite {

  private def withSpark[T](f: SparkSession => T): T = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-cachehygiene-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    f(s)
  }

  test("withNewPersisted captures a localCheckpoint's ids; unpersist frees them") {
    withSpark { spark =>
      import spark.implicits._
      val before = spark.sparkContext.getPersistentRDDs.keySet

      val (ck, ids) = CacheHygiene.withNewPersisted(spark) {
        (1 to 100).toDF("x").localCheckpoint()
      }
      assert(ids.nonEmpty, "a localCheckpoint must register at least one persistent RDD")
      assert(ids.forall(!before.contains(_)))
      assert(ck.count() == 100)

      CacheHygiene.unpersist(spark, ids)
      // unpersist is non-blocking; poll briefly for the registry to drain
      val deadline = System.nanoTime() + 10_000_000_000L
      def stillThere = spark.sparkContext.getPersistentRDDs.keySet.intersect(ids)
      while (stillThere.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(stillThere.isEmpty, s"ids $stillThere still persisted after unpersist")
    }
  }

  test("a loop that frees one round behind holds one copy, not k") {
    withSpark { spark =>
      import spark.implicits._
      val base = spark.sparkContext.getPersistentRDDs.keySet
      var (cur, curIds) = CacheHygiene.withNewPersisted(spark) {
        (1 to 50).toDF("x").localCheckpoint()
      }
      for (_ <- 1 to 4) {
        val (next, nextIds) = CacheHygiene.withNewPersisted(spark) {
          cur.selectExpr("x + 1 AS x").localCheckpoint()
        }
        CacheHygiene.unpersist(spark, curIds)
        cur = next
        curIds = nextIds
      }
      assert(cur.agg(org.apache.spark.sql.functions.sum("x")).as[Long].head() ==
        (1 to 50).map(_ + 4L).sum)
      val deadline = System.nanoTime() + 10_000_000_000L
      def live = spark.sparkContext.getPersistentRDDs.keySet -- base
      while (live.size > curIds.size && System.nanoTime() < deadline) Thread.sleep(50)
      assert(live == curIds,
        s"only the final round's checkpoint should remain; live=$live cur=$curIds")
      CacheHygiene.unpersist(spark, curIds)
    }
  }

  test("unpersist of an already-evicted id is a no-op") {
    withSpark { spark =>
      CacheHygiene.unpersist(spark, Set(999999))
    }
  }
}
