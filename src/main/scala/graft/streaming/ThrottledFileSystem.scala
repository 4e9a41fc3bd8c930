package graft.streaming

import java.net.URI
import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataInputStream, FSInputStream, Path, RawLocalFileSystem}

/** `throttle://` — a local filesystem whose READS obey remote-object-
  * store physics: a per-open latency (the GET round-trip) and a global
  * bandwidth cap shared by every concurrent stream in the JVM (the
  * recovering host's aggregate download limit). Writes are untouched.
  *
  * Purpose (SCALING.md round 17): the r16 recovery-slope measurement
  * was NVMe-bounded — this rig reads ≤1 GB of cold checkpoint in
  * under a second, so the snapshot-cadence knob
  * (`minDeltasForSnapshot`) measured nearly flat and the cluster-scale
  * claim ("cadence trades ingest overhead against recovery download
  * volume") stayed an argument. A cluster executor recovering RocksDB
  * state downloads its snapshot + changelog suffix from an object
  * store at NIC/store speed with a per-file GET round-trip; pointing
  * the StreamBench checkpoint at `throttle:///…`
  * (SPARK_GRAFT_CP_DIR) reproduces exactly that regime on local disk,
  * so the cadence knob's recovery spread becomes a measurement.
  *
  * Semantics: paths delegate to the local filesystem (the
  * RawLocalFileSystem superclass ignores the scheme when resolving to
  * java.io.File), so `throttle:///tmp/x` and `/tmp/x` are the same
  * bytes — only `open()` differs. Throttling is read-side only: the
  * cadence sweep must hold INGEST fixed (changelog/snapshot uploads
  * are writes) while recovery pays the remote-read physics. The
  * bandwidth token bucket is JVM-global (companion object), not
  * per-stream: 32 parallel restore tasks share one simulated NIC, as
  * they would share one executor host's. Knobs, read from the Hadoop
  * conf at FS init (thread via `spark.hadoop.*`):
  *
  *  - `fs.throttle.read.bytes.per.sec` — global read cap (0 = off);
  *  - `fs.throttle.open.latency.ms` — per-open sleep (0 = off).
  *
  * [[ThrottledFileSystem.counters]] reports (opens, bytes read) since
  * the last [[ThrottledFileSystem.resetCounters]] — StreamBench
  * publishes them with `recovery_s`, so each artifact carries the
  * read-volume evidence its cadence comparison rests on (changelog
  * replay reads every intermediate value version; a fresh snapshot
  * reads the final state once — the BYTES differ across cadences, not
  * just the file counts).
  */
final class ThrottledFileSystem extends RawLocalFileSystem {
  private var openLatencyMs = 0L

  override def getScheme: String = "throttle"
  override def getUri: URI = URI.create("throttle:///")

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    ThrottledFileSystem.setBytesPerSec(
      conf.getLong("fs.throttle.read.bytes.per.sec", 0L))
    openLatencyMs = conf.getLong("fs.throttle.open.latency.ms", 0L)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val inner = super.open(f, bufferSize)
    ThrottledFileSystem.opens.increment()
    if (openLatencyMs > 0) Thread.sleep(openLatencyMs)
    new FSDataInputStream(new ThrottledFileSystem.ThrottledStream(inner))
  }
}

object ThrottledFileSystem {
  private[streaming] val opens = new LongAdder
  private[streaming] val bytesRead = new LongAdder
  @volatile private var bytesPerSec = 0L
  // global token bucket: nanosecond deadline the NEXT read may start at
  private val nextFreeNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  private def setBytesPerSec(v: Long): Unit = bytesPerSec = v

  /** (opens, bytes read) through the scheme since the last reset. */
  def counters(): (Long, Long) = (opens.sum(), bytesRead.sum())
  def resetCounters(): Unit = { opens.reset(); bytesRead.reset() }

  /** Charge `n` bytes against the global bucket and sleep until the
    * bucket's clock catches up — serializes aggregate read throughput
    * at `bytesPerSec` across every stream in the JVM. */
  private def pace(n: Int): Unit = {
    if (n <= 0) return
    bytesRead.add(n)
    val bps = bytesPerSec
    if (bps <= 0) return
    val cost = n * 1000000000L / bps
    val now = System.nanoTime()
    // bucket idle-resets to `now`: past idle time earns no burst credit
    val start = nextFreeNanos.getAndUpdate(prev => math.max(prev, now) + cost)
    val waitNs = math.max(start, now) + cost - now
    if (waitNs > 500000L) Thread.sleep(waitNs / 1000000L, (waitNs % 1000000L).toInt)
  }

  /** Read-delegating wrapper that pays [[pace]] per byte batch. */
  private final class ThrottledStream(in: FSDataInputStream) extends FSInputStream {
    override def read(): Int = {
      val r = in.read(); if (r >= 0) pace(1); r
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(b, off, len); pace(r); r
    }
    override def read(pos: Long, b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(pos, b, off, len); pace(r); r
    }
    override def seek(pos: Long): Unit = in.seek(pos)
    override def getPos: Long = in.getPos
    override def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
    override def available(): Int = in.available()
    override def close(): Unit = in.close()
  }
}

/** FileContext face of the scheme (streaming's checkpoint manager
  * prefers FileContext for its atomic-rename commit protocol; without
  * this binding it falls back with a warning and the rig stops being a
  * faithful stand-in). Registered as
  * `fs.AbstractFileSystem.throttle.impl`. */
final class ThrottledAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new ThrottledFileSystem, conf, "throttle", false)
