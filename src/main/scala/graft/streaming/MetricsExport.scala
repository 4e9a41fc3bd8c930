package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.codahale.metrics.{Gauge, MetricRegistry}
import com.sun.net.httpserver.HttpServer

import graft.streaming.Observability.{LatencyStats, QueryStats, StatsListener}

/** Metrics-system export (SURVEY §2.8 parity with the reference's
  * Prometheus surface, src/Propulsion.Prometheus/PropulsionPrometheus
  * .fs:7-118): the in-process StatsListener / LatencyStats state
  * published two ways —
  *
  *  1. a Dropwizard [[MetricRegistry]] (metrics-core ships with Spark)
  *     of live gauges, suitable for `SparkEnv` metrics-system
  *     registration so every configured Spark sink (JMX, Graphite, CSV,
  *     the Prometheus servlet) picks the engine's numbers up with the
  *     executors'; registry names encode the reference's label pairs as
  *     dotted suffixes (`propulsion_scheduler_events_total.q1`);
  *  2. a Prometheus text-exposition endpoint (`GET /metrics` on a JDK
  *     HttpServer — zero extra dependencies) emitting the same series
  *     with proper `{group=...}` labels and the reference's metric
  *     names (propulsion_scheduler_*, propulsion_handler_seconds_*).
  *
  * Gauges read the listener snapshots lazily at scrape time; nothing
  * here sits on the hot path.
  */
object MetricsExport {

  /** Build a registry of live gauges rolled up across queries (the
    * Dropwizard model is label-free, so per-group breakdown lives on
    * the Prometheus endpoint; the registry carries the totals every
    * Spark sink can ship). */
  def registry(stats: StatsListener): MetricRegistry =
    registry(() => stats.snapshot)

  def registry(stats: () => Map[java.util.UUID, QueryStats]): MetricRegistry = {
    val r = new MetricRegistry
    def gauge[A](name: String)(f: => A): Unit =
      r.register(name, new Gauge[A] { override def getValue: A = f })
    // registered once, values resolved per scrape: enumerate the query
    // set lazily through one aggregate gauge per stat
    gauge("propulsion_scheduler_batches_total") {
      stats().values.map(_.batches).sum
    }
    gauge("propulsion_scheduler_events_total") {
      stats().values.map(_.inputRows).sum
    }
    gauge("propulsion_scheduler_state_rows") {
      stats().values.map(_.stateRows).sum
    }
    gauge("propulsion_scheduler_batch_seconds") {
      stats().values.map(_.lastBatchDurationMs).maxOption.getOrElse(0L) / 1000.0
    }
    gauge("propulsion_scheduler_events_per_second") {
      stats().values.map(_.lastInputRowsPerSec).sum
    }
    r
  }

  /** Render stats + latency as Prometheus text exposition (v0.0.4). */
  def prometheusText(
      stats: () => Map[java.util.UUID, QueryStats],
      latency: Option[LatencyStats],
      names: java.util.UUID => String = _.toString): String = {
    val sb = new StringBuilder
    def series(name: String, labels: Seq[(String, String)], v: Double): Unit = {
      val ls =
        if (labels.isEmpty) ""
        else labels.map { case (k, x) => s"""$k="$x"""" }.mkString("{", ",", "}")
      val num =
        if (v == v.toLong) v.toLong.toString
        else String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
      sb.append(name).append(ls).append(' ').append(num).append('\n')
    }
    for ((id, q) <- stats().toSeq.sortBy(_._1.toString)) {
      val g = Seq("group" -> names(id))
      series("propulsion_scheduler_batches_total", g, q.batches.toDouble)
      series("propulsion_scheduler_events_total", g, q.inputRows.toDouble)
      series("propulsion_scheduler_state_rows", g, q.stateRows.toDouble)
      series("propulsion_scheduler_batch_seconds", g, q.lastBatchDurationMs / 1000.0)
      series("propulsion_scheduler_events_per_second", g, q.lastInputRowsPerSec)
    }
    for (ls <- latency; key <- ls.keys; s <- ls.snapshot(key)) {
      // key = "{category}/{ok|failed}" (LatencyStats.instrument)
      val Array(cat, outcome) = key.split("/", 2)
      val g = Seq("group" -> cat, "kind" -> outcome)
      series("propulsion_handler_seconds_count", g, s.count.toDouble)
      series("propulsion_handler_seconds_sum", g, s.totalMs / 1000.0)
      series("propulsion_handler_seconds_max", g, s.maxMs / 1000.0)
      for ((q, v) <- Seq("0.5" -> s.p50Ms, "0.95" -> s.p95Ms, "0.99" -> s.p99Ms))
        series("propulsion_handler_seconds", g :+ ("quantile" -> q), v / 1000.0)
    }
    sb.toString
  }

  /** Serve `GET /metrics` on the given port (0 = ephemeral; read the
    * bound port off the returned server). Stop with `.stop(0)`. */
  def startPrometheusEndpoint(
      stats: () => Map[java.util.UUID, QueryStats],
      latency: Option[LatencyStats] = None,
      port: Int = 0,
      names: java.util.UUID => String = _.toString): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", exchange => {
      val body = prometheusText(stats, latency, names).getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4")
      exchange.sendResponseHeaders(200, body.length.toLong)
      val os = exchange.getResponseBody
      try os.write(body) finally os.close()
    })
    server.start()
    server
  }
}
