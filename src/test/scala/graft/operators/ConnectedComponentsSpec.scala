package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The CC loop's convergence guarantee on shapes the LSH corpus never
  * produces: a long chain needs O(diameter) rounds under plain
  * min-label propagation and would silently truncate at the round cap
  * — pointer jumping must close a 128-node chain (diameter 127) well
  * inside the cap, and mixed graphs must land every node in the
  * min-reachable-id component. */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cc-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Run `f` with the local-finish gate forced off, so the DISTRIBUTED
    * contraction loop itself is what converges. */
  private def distributedOnly[A](f: => A): A = {
    spark.conf.set("spark.graft.cc.localFinishEdges", "0")
    try f finally spark.conf.unset("spark.graft.cc.localFinishEdges")
  }

  test("128-node chain, clique, and pair all resolve to min-id components (distributed loop)") {
    import spark.implicits._
    // chain 0-1-...-127; clique on {1000..1004}; isolated edge (2000, 2001)
    val chain = (0L until 127L).map(i => (i, i + 1))
    val clique = for {
      i <- 1000L to 1004L; j <- 1000L to 1004L if i < j
    } yield (i, j)
    val pair = Seq((2000L, 2001L))
    val edges = (chain ++ clique ++ pair).toDF("a", "b")

    val got = distributedOnly(SimilarityQueries.componentsFromEdges(edges)
      .as[(Long, Long, Long)].collect().toSet)

    val expected = Set(
      (0L, 128L, (0L until 128L).sum),           // the chain
      (1000L, 5L, (1000L to 1004L).sum),         // the clique
      (2000L, 2L, 4001L))                        // the pair
    assert(got == expected)
  }

  test("shuffled ids: component is the min reachable id, not an artifact of order (distributed loop)") {
    import spark.implicits._
    // same chain topology but ids permuted so adjacency is not id-adjacent
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((0L until 100L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val got = distributedOnly(SimilarityQueries.componentsFromEdges(edges)
      .as[(Long, Long, Long)].collect().toSet)
    assert(got == Set((0L, 100L, (0L until 100L).sum)))
  }

  test("local finish (the default below the gate) agrees with the distributed loop exactly") {
    import spark.implicits._
    // adversarial mix: shuffled chain + cliques + self-contained pairs,
    // the shapes where union-find rooting vs star contraction could
    // diverge if either mis-rooted
    val rnd = new scala.util.Random(41)
    val ids = rnd.shuffle((0L until 200L).toVector)
    val chain = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val clique = for {
      i <- 500L to 509L; j <- 500L to 509L if i < j
    } yield (i, j)
    val edges = (chain ++ clique ++ Seq((900L, 901L), (903L, 902L))).toDF("a", "b")

    val viaLocal = SimilarityQueries.componentsFromEdges(edges)
      .as[(Long, Long, Long)].collect().toSet
    val viaLoop = distributedOnly(SimilarityQueries.componentsFromEdges(edges)
      .as[(Long, Long, Long)].collect().toSet)
    assert(viaLocal == viaLoop)
    assert(viaLocal == Set(
      (0L, 200L, (0L until 200L).sum),
      (500L, 10L, (500L to 509L).sum),
      (900L, 2L, 1801L), (902L, 2L, 1805L)))
  }

  test("mid-loop gate: a graph entering above a tiny gate contracts distributed, then finishes locally") {
    import spark.implicits._
    // force gate = 60 edges: the 100-edge shuffled chain starts above
    // it (200 sym edges), contracts for a round or two, then crosses
    // the gate and the union-find finishes the tail — the composed
    // path a 100 TB run takes
    val rnd = new scala.util.Random(11)
    val ids = rnd.shuffle((0L until 100L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    spark.conf.set("spark.graft.cc.localFinishEdges", "60")
    try {
      val got = SimilarityQueries.componentsFromEdges(edges)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((0L, 100L, (0L until 100L).sum)))
    } finally spark.conf.unset("spark.graft.cc.localFinishEdges")
  }
}
