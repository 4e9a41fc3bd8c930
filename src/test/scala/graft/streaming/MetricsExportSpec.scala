package graft.streaming

import java.net.{HttpURLConnection, URI}
import java.util.UUID

import graft.streaming.Observability.{LatencyStats, QueryStats}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Metrics export parity (reference PropulsionPrometheus.fs surface):
  * registry gauge contents, Prometheus text rendering, the /metrics
  * endpoint, and registration with a live Spark metrics system. */
class MetricsExportSpec extends AnyFunSuite {

  private val q1 = UUID.fromString("00000000-0000-0000-0000-000000000001")
  private val q2 = UUID.fromString("00000000-0000-0000-0000-000000000002")
  private val snap: () => Map[UUID, QueryStats] = () => Map(
    q1 -> QueryStats(batches = 3, inputRows = 120, stateRows = 7,
      lastBatchDurationMs = 250, lastInputRowsPerSec = 48.0),
    q2 -> QueryStats(batches = 1, inputRows = 30, stateRows = 2,
      lastBatchDurationMs = 500, lastInputRowsPerSec = 6.0))

  test("registry: rolled-up gauges resolve live at read time") {
    val r = MetricsExport.registry(snap)
    def g(n: String) = r.getGauges.get(n).getValue
    assert(g("propulsion_scheduler_batches_total") == 4L)
    assert(g("propulsion_scheduler_events_total") == 150L)
    assert(g("propulsion_scheduler_state_rows") == 9L)
    assert(g("propulsion_scheduler_batch_seconds") == 0.5)
    assert(g("propulsion_scheduler_events_per_second") == 54.0)
  }

  test("prometheus text: per-group series plus handler latency summaries") {
    val ls = new LatencyStats()
    ls.record("user/ok", 2000000L) // 2ms
    ls.record("user/ok", 4000000L)
    ls.record("user/failed", 8000000L)
    val txt = MetricsExport.prometheusText(snap, Some(ls),
      names = id => s"q${id.toString.last}")
    assert(txt.contains("""propulsion_scheduler_events_total{group="q1"} 120"""))
    assert(txt.contains("""propulsion_scheduler_events_total{group="q2"} 30"""))
    assert(txt.contains("""propulsion_scheduler_batch_seconds{group="q1"} 0.250000"""))
    assert(txt.contains("""propulsion_handler_seconds_count{group="user",kind="ok"} 2"""))
    assert(txt.contains("""propulsion_handler_seconds_count{group="user",kind="failed"} 1"""))
    assert(txt.contains("""propulsion_handler_seconds{group="user",kind="ok",quantile="0.5"}"""))
  }

  test("/metrics endpoint serves the exposition over HTTP") {
    val server = MetricsExport.startPrometheusEndpoint(snap)
    try {
      val port = server.getAddress.getPort
      val conn = URI.create(s"http://127.0.0.1:$port/metrics").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 200)
      assert(conn.getContentType.startsWith("text/plain"))
      val body = Source.fromInputStream(conn.getInputStream).mkString
      assert(body.contains("propulsion_scheduler_batches_total"))
    } finally server.stop(0)
  }

  test("registry plugs into a live Spark metrics system") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-metrics-test")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val src = org.apache.spark.metrics.source.GraftMetricsSource
        .register("graft", MetricsExport.registry(snap))
      // visible through the registered registry exactly as a sink reads it
      assert(src.metricRegistry.getGauges
        .get("propulsion_scheduler_events_total").getValue == 150L)
      org.apache.spark.metrics.source.GraftMetricsSource.remove(src)
    } finally spark.stop()
  }
}
