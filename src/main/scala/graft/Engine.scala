package graft

import org.apache.spark.sql.SparkSession

/** Library front door: a SparkSession.Builder pre-configured the way
  * the engine wants to run on a real cluster, with the engine's
  * Catalyst extension (selector pushdown + native function family)
  * injected.
  *
  * Sizing rationale (100 TB targets; override any of it):
  *  - AQE on, with skew-join splitting and partition coalescing —
  *    runtime stats beat static guesses at every scale.
  *  - `maxPartitionBytes` 256m: scan tasks sized so a 100 TB table is
  *    ~400k tasks, not 800k 128m slivers (driver scheduling pressure),
  *    while staying well inside executor memory with room for two
  *    live buffers per core.
  *  - `shuffle.partitions` left to AQE's coalescing from an
  *    intentionally high initial number (Spark default 200 is too low
  *    for big shuffles; `initialPartitionNum` 2000 lets AQE shrink
  *    rather than split).
  *  - session timezone UTC and ns-as-long parquet reads: the engine's
  *    oracle-checked timestamp conventions.
  */
object Engine {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "2000")
      .config("spark.sql.files.maxPartitionBytes", "268435456")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(ext => new graft.plans.SelectorExtension()(ext))

  /** A local session for tests/tools: `local[cores]`, shuffle
    * parallelism pinned to the core count (AQE coalescing from 2000
    * is counter-productive single-node).
    */
  def local(cores: Int): SparkSession = {
    val s = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      // Single-node: let AQE coalesce from the core count itself — a
      // high initialPartitionNum only adds per-shuffle overhead here.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
