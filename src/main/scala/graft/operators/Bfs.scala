package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source breadth-first search: hop distances from a seed set
  * over a directed edge list — k-hop neighborhoods, blast-radius /
  * reachability analysis, and the building block of shortest-path
  * features over interaction graphs.
  *
  * Scale design: classic frontier expansion. Iteration i joins ONLY
  * the newly-discovered frontier (never the full visited set) against
  * the cached edge list — work per round is Σ outdeg(frontier), the
  * minimum any BFS can do — then anti-joins the visited set to keep
  * first (= shortest, by BFS order) discoveries. All shuffles are hash
  * exchanges on vertex ids; per-round state is the |V|-bounded visited
  * table. Every step is set arithmetic on integers — deterministic
  * under any partitioning, replayable by a recursive-CTE oracle.
  *
  * Each round materializes its frontier (count) to truncate lineage
  * and to stop early when the frontier drains — without the count the
  * plan would re-expand every prior round at the terminal action.
  */
object Bfs {

  /** (node, dist) for every vertex within `maxHops` of a seed;
    * dist = hop count of the FIRST discovery (minimal, by BFS
    * invariant). Seeds are at distance 0. `edges` = (src, dst)
    * directed; bidirectionalize for undirected graphs.
    */
  def distances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.selectExpr("cast(src as long) as src", "cast(dst as long) as dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The visited set is the LAZY union of the per-hop frontiers, each
    // of which is cached exactly once (materialized by its drain-check
    // count). Total cache = Σ|frontier| = |reached| rows — no redundant
    // per-round copy of the whole visited set, no extra materializing
    // action per hop.
    val frontier0 = seeds.selectExpr("cast(node as long) as node").distinct()
      .withColumn("dist", lit(0)).persist(StorageLevel.MEMORY_AND_DISK)
    val frontiers = scala.collection.mutable.ArrayBuffer(frontier0)
    def visited = frontiers.reduce(_ union _)
    var frontier = frontier0
    var hop = 0
    var drained = false
    while (hop < maxHops && !drained) {
      hop += 1
      // Re-alias both sides: from round 2 the frontier derives from
      // the same cached edge plan, and unqualified refs would trip
      // Spark's ambiguous-self-join detection.
      val next = frontier.select(col("node").as("fnode"))
        .join(e.as("e"), col("fnode") === col("e.src"))
        .select(col("e.dst").as("node")).distinct()
        .join(visited.select(col("node").as("vnode")),
          col("node") === col("vnode"), "left_anti")
        .withColumn("dist", lit(hop))
        .persist(StorageLevel.MEMORY_AND_DISK)
      drained = next.count() == 0
      frontiers += next
      frontier = next
    }
    e.unpersist()
    visited
  }
}
