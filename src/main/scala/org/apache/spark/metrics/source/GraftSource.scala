package org.apache.spark.metrics.source

import com.codahale.metrics.MetricRegistry

/** Adapter between the engine's registry and Spark's MetricsSystem.
  *
  * Spark's `Source` trait is `private[spark]`, so a third-party
  * metrics source must be declared inside the Spark package namespace
  * — the established pattern for Spark-ecosystem libraries shipping
  * their own sources. Nothing else of Spark's internals is touched:
  * the class is a pure (name, registry) pair.
  */
class GraftSource(override val sourceName: String,
    override val metricRegistry: MetricRegistry) extends Source

object GraftSource {
  /** Register `registry` as metrics source `name` with this JVM's
    * MetricsSystem; false when no SparkEnv exists yet (caller retries).
    */
  def register(name: String, registry: MetricRegistry): Boolean = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) false
    else { env.metricsSystem.registerSource(new GraftSource(name, registry)); true }
  }
}
