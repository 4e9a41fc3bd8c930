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
}
