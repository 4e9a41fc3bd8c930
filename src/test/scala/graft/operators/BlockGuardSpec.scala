package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-size fail-fast guard (ScaleOps.guardBlockSize): the
  * |block|² pair operators must abort BEFORE the pair join when a block
  * exceeds spark.graft.guard.maxBlockRows — a K-held-fixed 100 TB run
  * fails in seconds with the knob named, instead of discovering the
  * quadratic at hour six (SCALING.md measured 71× at 10× data).
  */
class BlockGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-blockguard-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  private def withBound[A](bound: Long)(f: => A): A = {
    spark.conf.set("spark.graft.guard.maxBlockRows", bound.toString)
    try f finally spark.conf.unset("spark.graft.guard.maxBlockRows")
  }

  test("over-dense blocks abort before the pair join, naming block and knob") {
    // sf0.001 has ~12-13 vectors per label — a bound of 5 makes every
    // block "over-dense", standing in for the K-misconfigured corpus
    for (q <- Seq("q18_knn_graph", "q18_dedup_embed", "q18_triplets", "q18_semdedup")) {
      val e = intercept[Exception] {
        withBound(5L) { SparkEntry.queries(q)(spark, sfDir).count() }
      }
      val msgs = messages(e)
      assert(msgs.exists(_.contains("[graft]")),
        s"$q: guard did not fire: ${msgs.mkString(" | ").take(300)}")
      assert(msgs.exists(_.contains("maxBlockRows")),
        s"$q: abort message does not name the knob")
    }
  }

  test("the guard is pass-through at the default bound and when disabled") {
    val n = SparkEntry.queries("q18_knn_graph")(spark, sfDir).count()
    assert(n > 0)
    val off = withBound(0L) {
      SparkEntry.queries("q18_knn_graph")(spark, sfDir).count()
    }
    assert(off == n, "disabled guard changed the result")
  }

  test("NULL block keys abort loudly instead of silently falling out of the join") {
    import spark.implicits._
    val withNulls = Seq(
      (Some("a"), 1L), (Some("a"), 2L), (None: Option[String], 3L),
      (None: Option[String], 4L), (Some("b"), 5L)
    ).toDF("blk", "id")
    // a NULL key would silently drop from the equi-join-back, so the
    // guard must refuse it before a single row can vanish
    val e = intercept[Exception] {
      ScaleOps.guardBlockSize(withNulls, "blk", "nulltest").count()
    }
    assert(messages(e).exists(m => m.contains("NULL") && m.contains("nulltest")),
      "NULL block key must abort with the operator named")
    // and an all-non-null frame stays row-identical
    val clean = withNulls.where(col("blk").isNotNull)
    val kept = ScaleOps.guardBlockSize(clean, "blk", "nulltest")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 5L))
  }

  test("guard failure is fast: it raises from the size histogram, not the pairs") {
    // the abort must come from the tiny broadcast side materializing —
    // i.e. the exception surfaces without the pair join completing; we
    // pin the mechanism by checking the raise fires even when the pair
    // join would be enormous relative to the bound (every block over)
    val e = intercept[Exception] {
      withBound(1L) { SparkEntry.queries("q18_semdedup")(spark, sfDir).count() }
    }
    assert(messages(e).exists(_.contains("re-shard")),
      "abort message must point at the re-shard/K knob")
  }
}
