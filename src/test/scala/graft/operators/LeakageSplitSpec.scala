package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q18_leakage_split's contract beyond the oracle hash: the cluster
  * policy is structurally leakage-free (zero cross-split candidate
  * endpoints), the naive doc-id policy measurably is NOT on a corpus
  * with duplicates, and both policies partition the whole corpus. */
class LeakageSplitSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-leakage-split-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("cluster policy has zero cross-split leaks; naive policy leaks; both partition the corpus") {
    val rows = SimilarityQueries.q18LeakageSplit.build(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val byPolicy = rows.groupBy(_._1)
    assert(byPolicy.keySet == Set("cluster", "naive"))

    // cluster-aware: same component => same root => same split, so no
    // candidate pair can cross — the structural guarantee the operator
    // exists to provide
    assert(byPolicy("cluster").forall(_._4 == 0L),
      s"cluster policy leaked: ${byPolicy("cluster").mkString(", ")}")

    // naive doc-id hashing on a corpus with injected duplicates MUST
    // leak (the re-delivered copies carry shifted ids that hash to
    // other splits) — otherwise the fixture is not exercising the
    // comparison the query reports
    assert(byPolicy("naive").map(_._4).sum > 0L, "naive policy shows no leaks")

    // both policies assign every incoming doc exactly once
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val expectedN = corpus.count() + corpus.where(col("doc_id") % 10 === 0).count()
    assert(byPolicy("cluster").map(_._3).sum == expectedN)
    assert(byPolicy("naive").map(_._3).sum == expectedN)

    // all three splits are populated under both policies at this SF
    assert(byPolicy("cluster").map(_._2).toSet == Set("train", "val", "test"))
    assert(byPolicy("naive").map(_._2).toSet == Set("train", "val", "test"))
  }
}
