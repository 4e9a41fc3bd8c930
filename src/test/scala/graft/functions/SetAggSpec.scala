package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SetAgg.cappedDocSet: the bounded-state distinct-set aggregate under
  * q18_containment's rare-shingle index. Pins (1) exact distinct-set
  * semantics below the cap with SORTED (order-independent) output;
  * (2) NULL exactly when the group's distinct count exceeds the cap —
  * including when the overflow only appears at MERGE time (each
  * partition under the cap, union over it); (3) null inputs ignored;
  * (4) determinism across a repartition (the partial/merge path). */
class SetAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-setagg-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("distinct set below cap, sorted; overflow above cap is NULL") {
    import spark.implicits._
    // key "a": 3 distinct values with repeats; key "b": 6 distinct > cap 4
    val rows = Seq("a" -> 3L, "a" -> 1L, "a" -> 3L, "a" -> 2L) ++
      (1L to 6L).map("b" -> _)
    val out = rows.toDF("k", "v")
      .repartition(4) // force partial aggregation + merge
      .groupBy($"k").agg(SetAgg.cappedDocSet($"v", 4).as("ds"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("a").contains(Seq(1L, 2L, 3L)))
    assert(out("b").isEmpty)
  }

  test("overflow that only appears at merge time still nulls the group") {
    import spark.implicits._
    // two partitions, each with 3 distinct values (under cap 4), union 6
    val p0 = (1L to 3L).map(v => (0, "k", v))
    val p1 = (4L to 6L).map(v => (1, "k", v))
    val df = (p0 ++ p1).toDF("p", "k", "v").repartition(2, $"p")
    val out = df.groupBy($"k").agg(SetAgg.cappedDocSet($"v", 4).as("ds"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }

  test("null inputs are ignored; cap boundary is kept exactly") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L), Some(1L), None).map("k" -> _)
      .toDF("k", "v")
    val out = df.groupBy($"k").agg(SetAgg.cappedDocSet($"v", 2).as("ds"))
      .collect()
    // 2 distinct values at cap 2: kept exactly (overflow needs cap+1)
    assert(out(0).getSeq[Long](1) == Seq(1L, 2L))
  }

  test("result is invariant under row order and partitioning") {
    import spark.implicits._
    val vals = Seq(7L, 3L, 9L, 1L, 5L)
    val a = vals.map("k" -> _).toDF("k", "v").repartition(5)
      .groupBy($"k").agg(SetAgg.cappedDocSet($"v", 8).as("ds")).collect()
    val b = vals.reverse.map("k" -> _).toDF("k", "v").coalesce(1)
      .groupBy($"k").agg(SetAgg.cappedDocSet($"v", 8).as("ds")).collect()
    assert(a(0).getSeq[Long](1) == b(0).getSeq[Long](1))
    assert(a(0).getSeq[Long](1) == Seq(1L, 3L, 5L, 7L, 9L))
  }
}
