package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated in the
  * maximize-both sense — `q` dominates `p` when q.x ≥ p.x, q.y ≥ p.y
  * and they differ. The curation trade-off explorer (quality vs
  * length, coverage vs cost): everything off the frontier is strictly
  * worse than some frontier point on both axes.
  *
  * Decomposition that avoids the O(n²) dominance join: `p = (x, y)`
  * is non-dominated iff y is the maximum of its x-group AND
  * y > max{y' | x' > x}. So: (1) one map-side-combined aggregate to
  * per-x maxima; (2) a prefix-max sweep over that aggregated table in
  * x-descending order; (3) a broadcast semi-join keeps the original
  * rows sitting at frontier coordinates (coordinate duplicates are
  * mutually non-dominated and all kept).
  *
  * Scale note: the sweep window runs single-partition, but over the
  * |distinct x| AGGREGATED table, not the data — right-sized whenever
  * x is discrete or binned (counts, scores, grades). For continuous
  * x at extreme cardinality, bucket x first (the frontier of bucket
  * maxima over-approximates within one bucket width).
  */
object Skyline {

  /** Rows of `df` on the frontier (all columns kept; rows sharing a
    * frontier coordinate are mutually non-dominated and all kept).
    */
  def frontier2d(df: DataFrame, x: Column, y: Column): DataFrame = {
    val gmax = df.select(x.as("x"), y.as("y"))
      .groupBy(col("x")).agg(max(col("y")).as("ymax"))
    // Strictly-greater-x prefix max: ROWS 1 PRECEDING on the
    // x-distinct table (x unique there, so rows == "x' > x").
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = gmax
      .select(col("x"), col("ymax"), max(col("ymax")).over(w).as("pm"))
      .filter(col("pm").isNull || col("ymax") > col("pm"))
      .select(col("x").as("fx"), col("ymax").as("fy"))
    df.join(broadcast(frontier),
      x === col("fx") && y === col("fy"), "left_semi")
  }
}
