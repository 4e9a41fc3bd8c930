package org.apache.spark.metrics.source

import com.codahale.metrics.MetricRegistry

import org.apache.spark.SparkEnv

/** Bridge into Spark's metrics system. `Source` (and
  * `SparkEnv.metricsSystem`) are `private[spark]`, so this one class
  * lives in the `org.apache.spark.metrics.source` package — the
  * standard pattern public Spark instrumentation libraries use to
  * publish custom sources (there is no supported external API for it).
  * Everything engine-specific stays in [[graft.streaming.MetricsExport]];
  * this file only adapts a registry and hands it to the running
  * MetricsSystem, from which every configured sink (JMX, Graphite,
  * CSV, Prometheus servlet) picks it up alongside Spark's own sources.
  */
class GraftMetricsSource(
    override val sourceName: String,
    override val metricRegistry: MetricRegistry) extends Source

object GraftMetricsSource {

  /** Register `registry` under `name` with the active SparkEnv's
    * metrics system; returns the source so tests/callers can
    * `removeSource` it. Must run after the SparkSession is up. */
  def register(name: String, registry: MetricRegistry): GraftMetricsSource = {
    val src = new GraftMetricsSource(name, registry)
    SparkEnv.get.metricsSystem.registerSource(src)
    src
  }

  def remove(src: GraftMetricsSource): Unit =
    SparkEnv.get.metricsSystem.removeSource(src)
}
