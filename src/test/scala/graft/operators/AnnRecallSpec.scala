package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q18_ann_recall cross-check: a toy embedding corpus engineered so
  * one probe's true top-3 straddles two IVF cells (recall must be
  * 3333 bp) while another's sits inside its own cell (10000 bp),
  * compared against a direct Scala reimplementation of the whole
  * quantize → exact-top3 → centroid-route → in-cell-top3 → recall
  * chain — independent of both Spark SQL and the DuckDB oracle. */
class AnnRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-annrecall-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  // (vec_id, embedding, label). v1 = (0.5, 0.5) is the crosser: its
  // highest exact dots are the big-norm label-1 vectors, but centroid
  // routing sends it to label 0. All coordinates are multiples of 0.1
  // so quantization and the per-cell means are exact (no .5 rounding
  // edges between HALF_UP round and math.round).
  private val vecs: Seq[(Long, Seq[Float], Int)] = Seq(
    (0L, Seq(1.0f, 0.0f), 0),
    (1L, Seq(0.5f, 0.5f), 0),
    (2L, Seq(0.9f, 0.1f), 0),
    (3L, Seq(0.0f, 1.0f), 1),
    (4L, Seq(0.1f, 0.9f), 1),
    (5L, Seq(0.8f, 0.0f), 0),
    (6L, Seq(0.9f, 0.3f), 0),
    (7L, Seq(0.0f, 1.2f), 1),
    (8L, Seq(0.2f, 1.2f), 1),
    (9L, Seq(0.1f, 1.1f), 1))

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("annrecall").toString
    import spark.implicits._
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def qz(v: Seq[Float]): Seq[Long] = v.map(x => math.round(x.toDouble * 1e6))
  private def dot(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("q18_ann_recall matches the direct quantize/route/top3 computation") {
    val dir = writeFixture()
    val got = SparkEntry.queries("q18_ann_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    val q = vecs.map { case (id, v, l) => (id, qz(v), l) }
    val centroids: Map[Int, Seq[Long]] = q.groupBy(_._3).map { case (l, xs) =>
      l -> xs.head._2.indices.map { d =>
        math.round(xs.map(_._2(d)).sum.toDouble / xs.size)
      }
    }
    val expected = q.filter(_._1 < 5).map { case (pid, pq, _) =>
      val exact = q.filter(_._1 != pid)
        .sortBy { case (cid, cq, _) => (-dot(pq, cq), cid) }.take(3).map(_._1).toSet
      val routed = centroids.toSeq.sortBy { case (l, cx) =>
        (pq.zip(cx).map { case (x, c) => (x - c) * (x - c) }.sum, l)
      }.head._1
      val ivf = q.filter { case (cid, _, cl) => cl == routed && cid != pid }
        .sortBy { case (cid, cq, _) => (-dot(pq, cq), cid) }.take(3).map(_._1)
      val hits = ivf.count(exact.contains).toLong
      (pid, hits, ivf.size.toLong, 10000 * hits / 3)
    }.sortBy(_._1)

    assert(got == expected)
    // the fixture must actually exercise both outcomes
    assert(expected.exists(_._4 == 10000L) && expected.exists(_._4 < 10000L))
    val byId = expected.map(e => e._1 -> e._4).toMap
    assert(byId(1L) == 3333L, s"crosser probe should lose 2 of 3: $expected")
  }
}
