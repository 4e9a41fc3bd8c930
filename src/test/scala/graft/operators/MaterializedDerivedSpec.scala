package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The fingerprinted derived-copy cache ([[ScaleOps.materializedDerived]])
  * is load-bearing for correctness inputs (the shared shingle frames),
  * so its publish protocol gets the same discipline the round-14 port
  * gave the coordination stores:
  *
  *  - all fixture I/O goes through the FIXTURE dir's own Hadoop
  *    FileSystem — a scheme-qualified URI must fingerprint and build
  *    identically to the bare path (the java.io form silently listed
  *    nothing for any non-local URI, collapsing every fingerprint to a
  *    constant);
  *  - concurrent builders racing one cold fingerprint publish exactly
  *    once — the atomic-exclusive claim forbids the FS-dependent
  *    rename-onto-existing fallback that can MERGE two builders' part
  *    files (duplicated rows).
  */
class MaterializedDerivedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-matderived-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** A private little fixture dir holding one `documents` table, so
    * the fingerprint is cold and mutable without touching testdata. */
  private def makeFixture(tag: String, rows: Int): String = {
    val dir = Files.createTempDirectory(s"graft-md-$tag").toString
    spark.range(rows)
      .select(col("id").as("doc_id"), concat(lit("src"), col("id") % 3).as("source"),
        concat(lit("text body number "), col("id")).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a scheme-qualified fixture URI builds and reads the same derived copy") {
    val dir = makeFixture("scheme", 50)
    val build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.select(col("doc_id"), col("source"))
    val plain = ScaleOps.materializedDerived(spark, dir, "documents", "graft_mdspec_a_")(build)
    // same fixture through its file:-scheme URI: the Hadoop-FS
    // fingerprint must see the same files (the java.io form returned
    // an EMPTY listing here) and land on the same copy content
    val viaUri = ScaleOps.materializedDerived(spark, s"file:$dir", "documents", "graft_mdspec_a_")(build)
    assert(plain.count() == 50 && viaUri.count() == 50)
    assert(plain.collect().map(_.toString).sorted.sameElements(
      viaUri.collect().map(_.toString).sorted))
  }

  test("concurrent builders racing one cold fingerprint publish exactly once, no merged part files") {
    val dir = makeFixture("race", 200)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val ts = (0 until 4).map { _ =>
      val t = new Thread(() => {
        try {
          barrier.await()
          val df = ScaleOps.materializedDerived(spark, dir, "documents", "graft_mdspec_r_") {
            d => d.select(col("doc_id"), col("text"))
          }
          results.add(df.count())
        } catch { case e: Throwable => errs.add(e) }
      })
      t.start(); t
    }
    ts.foreach(_.join(180000))
    assert(errs.isEmpty, s"racing builders threw: ${errs.peek()}")
    // every racer sees exactly the source row count — a merged publish
    // (two builders' part files in one dir) would double it
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toVector == Vector.fill(4)(200L),
      s"racers saw ${results.asScala.toVector}")
    // and no claim or staging debris survives
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val debris = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft_mdspec_r_") &&
        (f.getName.endsWith(".claim") || f.getName.contains(".stage.")))
    assert(debris.isEmpty, s"left debris: ${debris.map(_.getName).mkString(", ")}")
  }

  test("a regenerated fixture (new content fingerprint) never pairs with the stale copy") {
    val dir = makeFixture("regen", 30)
    val n1 = ScaleOps.materializedDerived(spark, dir, "documents", "graft_mdspec_g_")(
      _.select(col("doc_id"))).count()
    assert(n1 == 30)
    Thread.sleep(1100L) // ensure a distinct mtime second on coarse filesystems
    spark.range(77)
      .select(col("id").as("doc_id"), lit("s").as("source"), lit("t").as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the ACROSS-SESSIONS guarantee is the fingerprint's job (within
    // one session, fixtures are immutable by contract — the wideRead
    // session cache pins the first copy; dppEvents scaladoc): a fresh
    // session must land on a NEW fingerprinted copy, never the stale one
    val s2 = spark.newSession()
    val n2 = ScaleOps.materializedDerived(s2, dir, "documents", "graft_mdspec_g_")(
      _.select(col("doc_id"))).count()
    assert(n2 == 77, s"stale copy served after regeneration: $n2")
  }
}
