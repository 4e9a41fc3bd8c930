package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SessionCache lifecycle: memoization per (session, key) and listener
  * eviction when the owning context stops. Owns its context start/stop
  * (suites run sequentially in one JVM; the next suite's getOrCreate
  * builds a fresh context). */
class SessionCacheSpec extends AnyFunSuite {

  test("memoizes per (session, key); evicts all entries on context stop") {
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName("graft-sessioncache-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val cache = new SessionCache[String, Int]()
      var builds = 0
      def get(k: String) = cache.getOrElseUpdate(spark, k) { builds += 1; builds }
      assert(get("a") == 1 && get("a") == 1, "same key must not rebuild")
      assert(get("b") == 2 && builds == 2)
      assert(cache.size == 2)
      spark.stop()
      // onApplicationEnd drains through the async listener bus; stop()
      // waits for it, but don't depend on exact ordering
      val deadline = System.nanoTime() + 5_000_000_000L
      while (cache.size != 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(cache.size == 0, "entries of the stopped session must be evicted")
      // a stopped session builds uncached rather than leaking an entry
      assert(cache.getOrElseUpdate(spark, "c") { 42 } == 42)
      assert(cache.size == 0)
    } finally if (!spark.sparkContext.isStopped) spark.stop()
  }

  test("termFreq memoizes the doc-term matrix per (session, corpus) and is count-exact") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-termfreq-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dir = "/root/testdata/sf0.001"
      val a = TextQueries.termFreq(spark, dir)
      val b = TextQueries.termFreq(spark, dir)
      assert(a eq b, "second lookup must return the memoized frame")
      // exactness anchor: Σ tf == raw token count of the corpus
      import org.apache.spark.sql.functions._
      val viaTf = a.agg(sum(col("tf"))).first().getLong(0)
      val raw = spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " "))).count()
      assert(viaTf == raw, s"tf total $viaTf != raw token count $raw")
    } finally if (!spark.sparkContext.isStopped) spark.stop()
  }

  test("concurrent lookups build once; reentrant builds on other keys don't deadlock") {
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName("graft-sessioncache-conc-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val cache = new SessionCache[String, Int]()
      // reentrancy: a build that consults the cache for ANOTHER key —
      // computeIfAbsent would throw IllegalStateException or deadlock
      // on a same-bin key; the lazy-holder pattern must not
      val v = cache.getOrElseUpdate(spark, "outer") {
        10 + cache.getOrElseUpdate(spark, "inner") { 5 }
      }
      assert(v == 15 && cache.size == 2)

      // N threads racing the same cold key: exactly one build, and no
      // thread blocks behind an unrelated key's long build
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val started = new java.util.concurrent.CountDownLatch(1)
      val slowDone = new java.util.concurrent.CountDownLatch(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        // occupy one key with a slow build...
        pool.submit(new Runnable {
          def run(): Unit = cache.getOrElseUpdate(spark, "slow") {
            started.countDown(); Thread.sleep(1500); slowDone.countDown(); 0
          }
        })
        started.await()
        // ...while other keys must complete immediately (bin-lock-free)
        val t0 = System.nanoTime()
        val fs = (1 to 8).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int =
              cache.getOrElseUpdate(spark, "hot") { builds.incrementAndGet(); 7 }
          })
        }
        assert(fs.map(_.get(5, java.util.concurrent.TimeUnit.SECONDS)).forall(_ == 7))
        val elapsedMs = (System.nanoTime() - t0) / 1000000
        assert(builds.get() == 1, s"hot key built ${builds.get()} times")
        assert(slowDone.getCount == 1 || elapsedMs < 1500,
          s"hot-key lookups waited ${elapsedMs}ms behind the slow build")
      } finally pool.shutdownNow()
    } finally if (!spark.sparkContext.isStopped) spark.stop()
  }
}
