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
  *  - `fs.throttle.open.latency.ms` — per-open sleep (0 = off);
  *  - `fs.throttle.list.latency.ms` — per-metadata-call sleep
  *    (listStatus / getFileStatus — object stores charge GET-class
  *    round-trips for LIST/HEAD too; 0 = off, the pre-r18 behavior
  *    where restart file-discovery was free on the rig).
  *
  * HAZARD (single-process rig by design): knobs and the token bucket
  * are JVM-global statics rewritten on every `FileSystem.initialize` —
  * two sessions/confs in one JVM with different `fs.throttle.*` values
  * silently share last-initializer-wins settings, and [[counters]]
  * conflates all concurrent readers. That is the intended model for
  * this rig (one JVM bucket = one executor's NIC; the recovery drives
  * run one conf per JVM and disable the FS cache), but do NOT reuse
  * the scheme for multi-tenant tests without keying bucket/knobs per
  * (scheme, conf) instance.
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
  private var listLatencyMs = 0L

  override def getScheme: String = "throttle"
  override def getUri: URI = URI.create("throttle:///")

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    ThrottledFileSystem.setBytesPerSec(
      conf.getLong("fs.throttle.read.bytes.per.sec", 0L))
    openLatencyMs = conf.getLong("fs.throttle.open.latency.ms", 0L)
    listLatencyMs = conf.getLong("fs.throttle.list.latency.ms", 0L)
  }

  // RawLocalFileSystem.open() virtually calls getFileStatus (Hadoop
  // 3.4.x) — that nested call is the open's own HEAD round-trip, the
  // same one S3A pays before the first GET. It KEEPS its LIST-class
  // latency charge (an open on an object store really is HEAD + GET),
  // but lands in the `heads` counter, not `lists` (ADVICE r18: ~2,639
  // of the 3,353 r18 "lists" were these open HEADs, which muddied the
  // discovery-round-trip reading). The inOpen ThreadLocal routes the
  // nested metadata call; cost model is unchanged from the r18 cells.
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val wasInOpen = ThrottledFileSystem.inOpen.get()
    ThrottledFileSystem.inOpen.set(true)
    val inner =
      try super.open(f, bufferSize)
      finally ThrottledFileSystem.inOpen.set(wasInOpen)
    ThrottledFileSystem.opens.increment()
    if (openLatencyMs > 0) ThrottledFileSystem.sleepMs(openLatencyMs)
    new FSDataInputStream(new ThrottledFileSystem.ThrottledStream(inner))
  }

  // Metadata round-trips (the LIST/HEAD class): object stores charge
  // GET-class latency for these too. Charged per CALL, not per entry —
  // a LIST page is one round-trip however many keys it returns (real
  // stores paginate at ~1000 keys/page; checkpoint dirs stay far under
  // that, so one call = one page is the faithful grain here).
  // RawLocalFileSystem.listStatus assembles its result by calling
  // this.getFileStatus once per CHILD — without the reentrancy guard a
  // 100-entry directory would pay 101 round-trips where the object
  // store pays one. The ThreadLocal marks "inside a listStatus of this
  // scheme"; nested metadata calls ride the already-charged LIST.
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    if (ThrottledFileSystem.inList.get()) super.listStatus(f)
    else {
      ThrottledFileSystem.lists.increment()
      ThrottledFileSystem.tagLane()
      if (listLatencyMs > 0) ThrottledFileSystem.sleepMs(listLatencyMs)
      ThrottledFileSystem.inList.set(true)
      try super.listStatus(f)
      finally ThrottledFileSystem.inList.set(false)
    }
  }

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    if (!ThrottledFileSystem.inList.get()) {
      if (ThrottledFileSystem.inOpen.get()) ThrottledFileSystem.heads.increment()
      else ThrottledFileSystem.lists.increment()
      ThrottledFileSystem.tagLane()
      if (listLatencyMs > 0) ThrottledFileSystem.sleepMs(listLatencyMs)
    }
    super.getFileStatus(f)
  }
}

object ThrottledFileSystem {
  private[streaming] val opens = new LongAdder
  private[streaming] val lists = new LongAdder
  private[streaming] val heads = new LongAdder
  private[streaming] val bytesRead = new LongAdder
  @volatile private var bytesPerSec = 0L
  private[streaming] val inList = ThreadLocal.withInitial[java.lang.Boolean](() => false)
  private[streaming] val inOpen = ThreadLocal.withInitial[java.lang.Boolean](() => false)
  // global token bucket, guarded by `bucket`: nanosecond deadline the
  // NEXT read may start at, plus the fractional cost carry — byte-nanos
  // not yet converted to whole deadline nanos (ADVICE r17: n*1e9/bps
  // truncates to 0 whenever bps > 1e9*n, so sub-cost reads accrued no
  // deadline and the effective rate drifted above multi-GB/s caps).
  private val bucket = new Object
  private var nextFreeNanos = 0L          // guarded by bucket
  private var carryByteNanos = 0L         // guarded by bucket, < bytesPerSec

  private def setBytesPerSec(v: Long): Unit = bytesPerSec = v

  /** (opens, bytes read) through the scheme since the last reset. */
  def counters(): (Long, Long) = (opens.sum(), bytesRead.sum())
  /** DISCOVERY metadata round-trips (listStatus + bare getFileStatus)
    * since the last reset. Since r19 this EXCLUDES the one HEAD every
    * open makes internally — those are [[headCalls]]; the pre-r19
    * cells' `lists` was the sum of both. */
  def listCalls(): Long = lists.sum()
  /** Open-driven HEAD round-trips (getFileStatus nested inside open). */
  def headCalls(): Long = heads.sum()

  /** Metadata round-trips made OUTSIDE any Spark task — the driver's
    * own checkpoint-log / state-metadata discovery (round 19: the
    * recovery cells' LIST-latency residual is a near-constant ~11–16 s
    * that no per-partition model explains; these calls serialize on
    * the driver thread, so count = serial seconds / latency). Lane
    * detection: a Spark executor thread always carries a TaskContext;
    * anything without one is driver-side (or a Spark internal pool
    * acting for the driver — same serialization property). */
  private[streaming] val driverMeta = new LongAdder
  // Thread-CLASS histogram of charged metadata calls (round 19,
  // SCALING follow-up 6 item 4): the TaskContext tag alone is only an
  // upper bound on serial driver work — the state-store download pools
  // are non-task threads too. Classifying by thread name (digits
  // collapsed, so "pool-7-thread-12" and "pool-7-thread-3" share a
  // class) lets the rig read which classes are single-threaded SERIAL
  // lanes vs parallel pools; the serial tranche the LIST cells
  // measured (~80 trips) must reproduce as the single-thread classes'
  // sum.
  private[streaming] val metaByClass =
    new java.util.concurrent.ConcurrentHashMap[String, LongAdder]
  private def threadClass(n: String): String = n.replaceAll("[0-9]+", "#")
  private[streaming] def tagLane(): Unit = {
    if (org.apache.spark.TaskContext.get() == null) driverMeta.increment()
    metaByClass
      .computeIfAbsent(threadClass(Thread.currentThread().getName), _ => new LongAdder)
      .increment()
  }
  def driverMetaCalls(): Long = driverMeta.sum()
  /** Charged metadata calls per thread-name class since last reset. */
  def metaThreadClasses(): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    metaByClass.forEach((k, v) => b += k -> v.sum())
    b.result()
  }

  def resetCounters(): Unit = {
    opens.reset(); lists.reset(); heads.reset(); driverMeta.reset()
    metaByClass.clear(); bytesRead.reset()
  }

  /** Sleep that stays an IO-layer citizen under task kill (ADVICE r17):
    * a Spark interrupt must surface as InterruptedIOException out of a
    * FileSystem path — callers classify IOException as an IO failure,
    * but a raw InterruptedException from a read path reads as a bug. */
  private[streaming] def sleepMs(ms: Long): Unit = sleepNs(ms * 1000000L)

  private def sleepNs(ns: Long): Unit =
    try Thread.sleep(ns / 1000000L, (ns % 1000000L).toInt)
    catch {
      case ie: InterruptedException =>
        Thread.currentThread().interrupt()
        val iio = new java.io.InterruptedIOException("throttle pace interrupted")
        iio.initCause(ie)
        throw iio
    }

  /** Charge `n` bytes against the global bucket and sleep until the
    * bucket's clock catches up — serializes aggregate read throughput
    * at `bytesPerSec` across every stream in the JVM. Fractional costs
    * accumulate in `carryByteNanos`, so the configured rate holds even
    * when single reads cost less than one nanosecond. */
  private def pace(n: Int): Unit = {
    if (n <= 0) return
    bytesRead.add(n)
    val bps = bytesPerSec
    if (bps <= 0) return
    val waitNs = bucket.synchronized {
      val total = carryByteNanos + n * 1000000000L
      val cost = total / bps
      carryByteNanos = total % bps
      val now = System.nanoTime()
      // bucket idle-resets to `now`: past idle time earns no burst credit
      val start = math.max(nextFreeNanos, now)
      nextFreeNanos = start + cost
      start + cost - now
    }
    if (waitNs > 500000L) sleepNs(waitNs)
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
