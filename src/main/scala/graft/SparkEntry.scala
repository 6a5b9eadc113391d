package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator exposed by the engine (one entry per
  * SURVEY.md §2 line that is implemented); `oracleSql` carries the DuckDB
  * equivalent for the driver's differential check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + aggregation — exercises broadcast joins, partial
    * aggregation, and parquet pushdown in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.GazetteOps.queries ++
    graft.queries.PipelineOps.queries ++
    graft.queries.StreamOps.queries ++
    graft.queries.MultimodalOps.queries ++
    graft.queries.AnalyticOps.queries ++
    graft.queries.CurationOps.queries ++
    graft.queries.CorpusOps.queries ++
    graft.queries.ClusterOps.queries ++
    graft.queries.ScaleOps.queries ++
    graft.queries.BehaviorOps.queries ++
    graft.queries.ServeOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
    graft.queries.GazetteOps.oracleSql ++
    graft.queries.PipelineOps.oracleSql ++
    graft.queries.StreamOps.oracleSql ++
    graft.queries.MultimodalOps.oracleSql ++
    graft.queries.AnalyticOps.oracleSql ++
    graft.queries.CurationOps.oracleSql ++
    graft.queries.CorpusOps.oracleSql ++
    graft.queries.ClusterOps.oracleSql ++
    graft.queries.ScaleOps.oracleSql ++
    graft.queries.BehaviorOps.oracleSql ++
    graft.queries.ServeOps.oracleSql
}
