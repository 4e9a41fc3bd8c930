package graft.streaming

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The download-bound recovery rig's filesystem (SCALING.md round 17):
  * `throttle://` must resolve through both Hadoop faces (FileSystem
  * for the RocksDB file manager, FileContext for the streaming
  * checkpoint manager's atomic renames), read bytes identically to the
  * local path, pay the configured per-open latency and GLOBAL
  * bandwidth cap on reads only, and account what it served. */
class ThrottledFsSpec extends AnyFunSuite {

  private def conf(bps: Long, openMs: Long, listMs: Long = 0L): Configuration = {
    val c = new Configuration()
    c.set("fs.throttle.impl", classOf[ThrottledFileSystem].getName)
    c.set("fs.AbstractFileSystem.throttle.impl", classOf[ThrottledAbstractFs].getName)
    c.setLong("fs.throttle.read.bytes.per.sec", bps)
    c.setLong("fs.throttle.open.latency.ms", openMs)
    c.setLong("fs.throttle.list.latency.ms", listMs)
    // no JVM-wide FileSystem.get cache: each test's knobs must bind
    c.setBoolean("fs.throttle.impl.disable.cache", true)
    c
  }

  private def writeLocal(dir: java.nio.file.Path, name: String, size: Int): Array[Byte] = {
    val rnd = new java.util.Random(42)
    val bytes = new Array[Byte](size)
    rnd.nextBytes(bytes)
    java.nio.file.Files.write(dir.resolve(name), bytes)
    bytes
  }

  private def readAll(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  test("scheme resolves on both Hadoop faces and reads the local bytes verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("thr-fs")
    val expect = writeLocal(dir, "blob", 64 * 1024)
    val fs = FileSystem.get(new URI("throttle:///"), conf(0L, 0L))
    assert(fs.isInstanceOf[ThrottledFileSystem])
    ThrottledFileSystem.resetCounters()
    val got = readAll(fs, new Path(s"throttle://$dir/blob"))
    assert(got.sameElements(expect), "throttled read returns the local file's bytes")
    val (opens, bytes) = ThrottledFileSystem.counters()
    assert(opens == 1L && bytes == expect.length.toLong,
      s"accounting: opens=$opens bytes=$bytes")
    // FileContext face: the checkpoint manager's atomic-rename path
    val fc = FileContext.getFileContext(new URI("throttle:///"), conf(0L, 0L))
    val st = fc.getFileStatus(new Path(s"throttle://$dir/blob"))
    assert(st.getLen == expect.length.toLong)
  }

  test("per-open latency and the global read-bandwidth cap bind; writes pay neither") {
    val dir = java.nio.file.Files.createTempDirectory("thr-knobs")
    writeLocal(dir, "blob", 256 * 1024)
    // 1 MiB/s + 50 ms/open over 256 KiB → at least 250 ms bandwidth
    // + 50 ms open. Sleep-based pacing can only overshoot, so assert
    // the lower bound.
    val fs = FileSystem.get(new URI("throttle:///"), conf(1024 * 1024, 50L))
    val t0 = System.nanoTime()
    readAll(fs, new Path(s"throttle://$dir/blob"))
    val readMs = (System.nanoTime() - t0) / 1e6
    assert(readMs >= 280.0, s"250 KiB at 1 MiB/s + 50 ms open took ${readMs}ms")
    // writes pay neither knob — proven by the accounting, not a wall
    // clock (a loaded test host can stall any write; the counters
    // cannot move unless the write path went through open/pace)
    val (opensBefore, bytesBefore) = ThrottledFileSystem.counters()
    val out = fs.create(new Path(s"throttle://$dir/out"), true)
    try out.write(new Array[Byte](256 * 1024)) finally out.close()
    val (opensAfter, bytesAfter) = ThrottledFileSystem.counters()
    assert(opensAfter == opensBefore && bytesAfter == bytesBefore,
      "a write must not touch the open/read throttles")
  }

  test("metadata calls pay LIST-class latency: one round-trip per call, not per entry") {
    val dir = java.nio.file.Files.createTempDirectory("thr-list")
    (1 to 20).foreach(i => writeLocal(dir, s"f$i", 16))
    val fs = FileSystem.get(new URI("throttle:///"), conf(0L, 0L, listMs = 40L))
    ThrottledFileSystem.resetCounters()
    val t0 = System.nanoTime()
    val entries = fs.listStatus(new Path(s"throttle://$dir"))
    val listMs = (System.nanoTime() - t0) / 1e6
    assert(entries.length == 20)
    // RawLocalFileSystem.listStatus internally getFileStatus-es every
    // child — the reentrancy guard must charge ONE round-trip for the
    // whole page (an object-store LIST returns the keys' metadata in
    // one response), so 20 entries cost ~40 ms, not ~840.
    assert(ThrottledFileSystem.listCalls() == 1L,
      s"one LIST call charged once, got ${ThrottledFileSystem.listCalls()}")
    assert(listMs >= 40.0 && listMs < 400.0,
      s"20-entry list at 40 ms/round-trip took ${listMs}ms")
    // a bare HEAD (getFileStatus outside any list) pays its own trip
    fs.getFileStatus(new Path(s"throttle://$dir/f1"))
    assert(ThrottledFileSystem.listCalls() == 2L)
    // an OPEN's internal getFileStatus (RawLocalFileSystem virtually
    // HEADs before reading — same as S3A) still PAYS LIST-class
    // latency but lands in headCalls, not listCalls: `lists` stays a
    // pure discovery count (ADVICE r18; pre-r19 cells folded both)
    assert(ThrottledFileSystem.headCalls() == 0L)
    val tOpen = System.nanoTime()
    readAll(fs, new Path(s"throttle://$dir/f1"))
    val openMs = (System.nanoTime() - tOpen) / 1e6
    assert(ThrottledFileSystem.listCalls() == 2L,
      s"open must not inflate the discovery count, got ${ThrottledFileSystem.listCalls()}")
    assert(ThrottledFileSystem.headCalls() == 1L,
      s"open's implicit HEAD must be counted, got ${ThrottledFileSystem.headCalls()}")
    assert(openMs >= 40.0, s"the open HEAD keeps its 40 ms charge, took ${openMs}ms")
    // lane tagging: this spec runs on a plain JVM thread (no Spark
    // TaskContext), so every charged metadata call above must also be
    // in the driver-lane counter — lists(2) + heads(1)
    assert(ThrottledFileSystem.driverMetaCalls() == 3L,
      s"driver-lane meta count, got ${ThrottledFileSystem.driverMetaCalls()}")
    // and with the knob off the accounting still counts but costs nothing
    val fs0 = FileSystem.get(new URI("throttle:///"), conf(0L, 0L))
    val t1 = System.nanoTime()
    fs0.listStatus(new Path(s"throttle://$dir"))
    assert((System.nanoTime() - t1) / 1e6 < 200.0, "knob off = no latency")
  }

  test("a task-kill interrupt surfaces as InterruptedIOException, not a bare InterruptedException") {
    val dir = java.nio.file.Files.createTempDirectory("thr-intr")
    writeLocal(dir, "blob", 1024 * 1024)
    // 64 KiB/s over 1 MiB → ~16 s of pacing: the reader WILL be asleep
    val fs = FileSystem.get(new URI("throttle:///"), conf(64 * 1024, 0L))
    @volatile var caught: Throwable = null
    @volatile var flagRestored = false
    val t = new Thread(() => {
      try { readAll(fs, new Path(s"throttle://$dir/blob")): Unit }
      catch { case e: Throwable =>
        caught = e
        flagRestored = Thread.currentThread().isInterrupted
      }
    })
    t.start()
    Thread.sleep(300) // let it enter the paced sleep
    t.interrupt()
    t.join(5000)
    assert(!t.isAlive, "reader must unwind promptly after interrupt")
    assert(caught != null, "interrupt must surface")
    assert(caught.isInstanceOf[java.io.InterruptedIOException],
      s"an FS read path owes IOException semantics, got ${caught.getClass}")
    assert(flagRestored, "the thread's interrupt flag must be restored")
  }

  test("the bandwidth bucket is JVM-global: concurrent readers share one simulated NIC") {
    val dir = java.nio.file.Files.createTempDirectory("thr-global")
    writeLocal(dir, "a", 128 * 1024)
    writeLocal(dir, "b", 128 * 1024)
    val fs = FileSystem.get(new URI("throttle:///"), conf(512 * 1024, 0L))
    // two parallel 128 KiB readers over a 512 KiB/s GLOBAL cap: 256 KiB
    // aggregate → ≥ ~500 ms wall; per-stream buckets would finish in ~250
    val t0 = System.nanoTime()
    val threads = Seq("a", "b").map { n =>
      val t = new Thread(() => { readAll(fs, new Path(s"throttle://$dir/$n")): Unit })
      t.start(); t
    }
    threads.foreach(_.join())
    val wallMs = (System.nanoTime() - t0) / 1e6
    assert(wallMs >= 420.0,
      s"global bucket must serialize aggregate throughput, wall=${wallMs}ms")
  }
}
