package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact triangle enumeration by degree-ordered orientation.
  *
  * The naive wedge join (every path u–v–w closed against the edge set)
  * enumerates each triangle three times and — worse — builds wedge sets
  * sized Σ deg(v)², which a single celebrity vertex turns quadratic.
  * Orienting every undirected edge from its (degree, id)-smaller
  * endpoint to its larger fixes both: each triangle has exactly one
  * vertex with two out-edges inside it (the (degree, id)-least), so it
  * is found exactly once, and out-degrees are capped at O(√m) — a
  * vertex with out-degree d has d neighbors of degree ≥ its own, which
  * needs ≥ d·d/2 edges. Wedge work is therefore O(m^1.5) worst case
  * regardless of skew: the celebrity vertex contributes IN-edges, not
  * wedges. This is the standard shape for counting at 100 TB — two
  * hash-shuffle joins (on the wedge pivot, then on the closing (v, w)
  * pair), no per-vertex adjacency materialization, no driver state.
  *
  * All arithmetic is exact and partition-order-independent, so the
  * result is reproducible on any cluster layout and replayable by an
  * external SQL engine (the q95 oracle runs the identical plan).
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected edge
    * list. `edges` must have columns (u, v); self-loops are dropped,
    * duplicate/reversed edges deduplicated. Returns (node, n_tri) for
    * every node on ≥ 1 triangle.
    *
    * `okey = struct(degree, id)` is the total orientation order, a
    * lexicographic struct comparison (codegen'd field-by-field). It
    * replaced a packed `degree·10⁹ + id` long, which silently required
    * ids < 10⁹ — real corpora (and the derived sf1 replicas, striding
    * ids by 10¹²) exceed that. Any long id works now.
    */
  def perNodeCounts(edges: DataFrame): DataFrame = {
    // Persisted: the degree union reads it twice and the orientation
    // join once more — without the cache the whole upstream edge
    // derivation (often a join itself, e.g. q95's co-purchase pairs)
    // would run three times.
    val e = edges.selectExpr("cast(u as long) as u", "cast(v as long) as v")
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // (degree, id) as a lexicographically-ordered STRUCT, not a packed
    // long: d·10⁹+n silently required ids < 10⁹ (the guard that
    // enforced it refused the derived sf1 corpus, whose replica ids
    // stride by 10¹²) — and a 100 TB graph WILL carry ids past 10⁹.
    // Struct comparison is codegen'd field-by-field; no range limit.
    val key = deg.select(col("n"),
      struct(col("d"), col("n")).as("okey"))
    // Orient each edge toward the (degree, id)-larger endpoint; keep the
    // destination's okey for the wedge ordering below. Persisted because
    // the triangle plan reads it three times and Spark has no
    // cross-branch common-subexpression reuse (each read would otherwise
    // recompute the dedup + degree join from the scan).
    val o = e
      .join(key.select(col("n").as("u"), col("okey").as("ku")), "u")
      .join(key.select(col("n").as("v"), col("okey").as("kv")), "v")
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("dst"),
        greatest(col("ku"), col("kv")).as("dkey"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Wedges pivot on the common src; the okey inequality orders the two
    // out-neighbors so each candidate pair is formed once. The closing
    // join then probes the oriented edge set itself: (v, w) is oriented
    // v→w exactly when it exists, because okey(v) < okey(w) already.
    val a = o.select(col("src"), col("dst").as("y"), col("dkey"))
    val b = o.select(col("src"), col("dst").as("z"), col("dkey").as("dkey2"))
    val tri = a.join(b, Seq("src")).filter(col("dkey") < col("dkey2"))
      .join(o.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"))
      .select(col("src").as("x"), col("y"), col("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
