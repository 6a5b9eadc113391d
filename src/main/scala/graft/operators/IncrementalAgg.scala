package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped count/sum materializations
  * — the companion of [[SnapshotDiff]]: when a 100 TB corpus moves from
  * snapshot A to snapshot B, a per-group aggregate should be updated
  * from the (tiny) change set, not recomputed from scratch. Count and
  * sum are self-inverse under deltas, so maintenance is: emit
  * (-1, -value) for removed rows and the old image of changed rows,
  * (+1, +value) for added rows and the new image, pre-aggregate the
  * deltas per group (map-side combined), and merge with one outer join
  * against the materialization. Work scales with |changes|, not |B|.
  */
object IncrementalAgg {

  /** Per-group (count, sum) delta between snapshots `a` and `b`, keyed
    * by `key`, grouped by `grp`, summing `value`, with row change
    * detected by fingerprint `fp` (all evaluated per side). Unchanged
    * rows contribute nothing and never leave their scan.
    */
  def countSumDelta(a: DataFrame, b: DataFrame, key: String, grp: String,
      value: Column, fp: Column): DataFrame = {
    def side(df: DataFrame, sign: Int) =
      df.select(col(key).as("k"), col(grp).as("g"),
        value.cast("long").as("v"), fp.as("fp"), lit(sign).as("sign"))
    val fa = side(a, -1)
    val fb = side(b, +1)
    // Full-outer on key; a row survives the filter iff it is added,
    // removed, or changed — each surviving side contributes its sign.
    // Null-SAFE fingerprint compare: md5 of a NULL payload is NULL, and
    // a plain =!= would evaluate NULL on a one-sided-null pair — the
    // filter would drop it and the delta would miss the change
    // (SnapshotDiff uses <=> for exactly this case).
    val j = fa.as("a").join(fb.as("b"), col("a.k") === col("b.k"), "full_outer")
      .filter(col("a.k").isNull || col("b.k").isNull ||
        !(col("a.fp") <=> col("b.fp")))
    // Both sides' contributions in ONE pass over the join (a unionAll
    // of two filtered branches would re-run the join per branch —
    // Spark has no cross-branch plan reuse).
    val contrib = j.select(explode(array(
        struct(col("a.g").as("g"), col("a.sign").as("sign"), col("a.v").as("v")),
        struct(col("b.g").as("g"), col("b.sign").as("sign"), col("b.v").as("v")))).as("c"))
      .filter(col("c.sign").isNotNull)
      .select(col("c.g").as("g"), col("c.sign").as("sign"), col("c.v").as("v"))
    contrib.groupBy(col("g"))
      .agg(sum(col("sign")).as("dn"), sum(col("sign") * col("v")).as("ds"))
  }

  /** Apply a (dn, ds) delta to a (g, n, s) materialization; groups
    * whose count reaches zero disappear (as a fresh aggregation would
    * never have produced them).
    */
  def maintainCountSum(agg: DataFrame, delta: DataFrame): DataFrame =
    // Null-safe group join: a NULL group is a legal aggregation key and
    // must merge with its delta rather than split into two rows.
    agg.as("a").join(delta.as("d"), col("a.g") <=> col("d.g"), "full_outer")
      .select(coalesce(col("a.g"), col("d.g")).as("g"),
        (coalesce(col("a.n"), lit(0L)) + coalesce(col("d.dn"), lit(0L))).as("n"),
        (coalesce(col("a.s"), lit(0L)) + coalesce(col("d.ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
}
