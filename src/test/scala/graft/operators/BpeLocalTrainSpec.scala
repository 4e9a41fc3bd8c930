package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The BPE local-train gate must be invisible in the artifact: all
  * k greedy merges trained in one executor task (the default below
  * spark.graft.bpe.localTrainWords) must equal the per-round
  * distributed loop (gate=0) EXACTLY — same pairs, same counts, same
  * order — on the real corpus, where argmax ties and merge-created
  * symbol interactions actually occur. Tie-break parity is the sharp
  * edge: the distributed orderBy compares strings in UTF8String
  * binary order, which the local trainer reproduces with unsigned
  * UTF-8 byte comparison. */
class BpeLocalTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bpe-local-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("local one-task training equals the distributed per-round loop on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val viaLocal = TextQueries.trainBpeMerges(spark, dir)
    spark.conf.set("spark.graft.bpe.localTrainWords", "0")
    val viaLoop =
      try TextQueries.trainBpeMerges(spark, dir)
      finally spark.conf.unset("spark.graft.bpe.localTrainWords")
    assert(viaLocal.size == TextQueries.BpeMergeRounds)
    assert(viaLocal == viaLoop,
      s"local vs distributed merge tables diverged:\n$viaLocal\n$viaLoop")
  }
}
