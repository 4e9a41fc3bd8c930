package graft.streaming

/** Deterministic in-process SIGKILL for crash-recovery drives: when
  * env `SPARK_GRAFT_CRASH_POINT` = `<name>:<n>`, the n-th passage
  * through `CrashPoint.maybe(name)` halts the JVM with
  * `Runtime.halt` — no shutdown hooks, no finally blocks, no Spark
  * stop: the closest in-process equivalent to `kill -9`, but landing
  * at an EXACT protocol instant instead of wherever a timed external
  * kill happens to fall. Production cost: the env var is read once;
  * with it unset every `maybe` call is one match on a cached None.
  *
  * Points live inside [[CheckpointStore.commit]]'s swap/GC windows
  * (`ckpt-pre-swap`, `ckpt-pre-gc`, `ckpt-mid-gc`) so
  * tools/crash_resume_drive.sh can prove the exactly-once chain
  * across a kill in each window — mid-batch kills exercise the
  * Spark-side WAL/commit-log recovery, these exercise the external
  * store's own atomicity argument at its weakest instants. */
object CrashPoint {

  private val spec: Option[(String, Int)] =
    sys.env.get("SPARK_GRAFT_CRASH_POINT").flatMap { s =>
      val i = s.lastIndexOf(':')
      if (i < 0) None else s.drop(i + 1).toIntOption.map(n => (s.take(i), n))
    }

  private val hits =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def maybe(name: String): Unit = spec match {
    case Some((n, k)) if n == name =>
      val c = hits.computeIfAbsent(name,
        _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
      if (c == k) {
        System.err.println(s"[crashpoint] halting at $name hit #$k")
        Runtime.getRuntime.halt(137)
      }
    case _ => ()
  }
}
