package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The pagerank local-finish gate must be invisible in the artifact —
  * and unlike the BPE gate, invisibility here is structural: every PR
  * value is integer and each round pure integer arithmetic, so task
  * count cannot perturb a value. The spec still pins it empirically:
  * the one-task path (default below the gate) must equal the
  * distributed three-round plan (gate=0) exactly, on the real corpus
  * and at both scale directions of the top-20 tie-break. */
class PagerankLocalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pr-local-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("local one-task pagerank equals the distributed rounds on the real corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q18_pagerank")
    val viaLocal = q(spark, dir).as[(Long, Long)].collect().toSeq
    spark.conf.set("spark.graft.pr.localEdges", "0")
    val viaLoop =
      try q(spark, dir).as[(Long, Long)].collect().toSeq
      finally spark.conf.unset("spark.graft.pr.localEdges")
    assert(viaLocal.nonEmpty)
    assert(viaLocal == viaLoop,
      s"local vs distributed pagerank diverged:\n$viaLocal\n$viaLoop")
  }
}
