package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: frequency estimation in d·w counters.
  *
  * The sketch is d hash rows of w counters; every occurrence of item x
  * increments counter (j, h_j(x)) for each row j, and the estimate for
  * x is min_j counter(j, h_j(x)) — always ≥ the true count, within
  * ε·N of it with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The
  * 100 TB story is the counter table itself: d·w rows regardless of
  * vocabulary size, built by one partial→final aggregate (map-side
  * combine collapses each partition to ≤ d·w rows before the shuffle)
  * and mergeable across corpora/streams by plain counter addition —
  * the same contract as the KMV/HLL/Misra-Gries family this completes.
  *
  * Hashes are md5-derived (row-salted, first 8 hex digits), the
  * engine's standing deterministic-randomness idiom (Curation
  * .weightedKeep): bit-reproducible on any cluster layout and
  * replayable in an external SQL dialect.
  */
object CountMin {

  private def bucket(item: Column, j: Int, w: Int): Column =
    conv(substring(md5(concat(lit(s"cms$j:"), item)), 1, 8), 16, 10)
      .cast("long") % w

  /** The counter table (j, bucket, c) for item occurrences (one count
    * per input row). d·w bounded output; merge sketches by
    * union-groupBy-sum.
    */
  def sketch(items: DataFrame, item: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1 rows and w >= 1 buckets, got d=$d w=$w")
    val rows = (0 until d).map(j =>
      struct(lit(j).as("j"), bucket(item, j, w).as("bucket")))
    // NULL items are excluded by contract: md5(NULL) is NULL, so their
    // counts would land in NULL-bucket rows that estimate's equi-join
    // could never re-find — an item with a huge true count estimating 0
    // would break the CMS >= guarantee.
    items.filter(item.isNotNull).select(explode(array(rows: _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Sketch from a PRE-AGGREGATED (item, n) count table — identical
    * counters to [[sketch]] over the expanded occurrence rows, at
    * vocab-sized input (callers that already hold counts shouldn't
    * materialize the per-occurrence explode just to re-count it).
    */
  def sketchCounts(counts: DataFrame, item: Column, n: Column,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1 rows and w >= 1 buckets, got d=$d w=$w")
    val rows = (0 until d).map(j =>
      struct(lit(j).as("j"), bucket(item, j, w).as("bucket"),
        n.cast("long").as("c")))
    counts.filter(item.isNotNull).select(explode(array(rows: _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(sum(col("jb.c")).as("c"))
  }

  /** Point estimates for `probes` (any DataFrame with distinct `item`
    * values): (item, est) with est = min over rows of the probed
    * counter, 0 when a row's bucket is empty. The probe is a hash join
    * of |probes|·d rows against the d·w counter table — no rescan of
    * the sketched corpus.
    */
  def estimate(sk: DataFrame, probes: DataFrame, item: Column,
      d: Int, w: Int): DataFrame = {
    val rows = (0 until d).map(j =>
      struct(lit(j).as("j"), bucket(item, j, w).as("bucket")))
    probes.select(item.as("item"), explode(array(rows: _*)).as("jb"))
      .join(sk, col("jb.j") === sk("j") && col("jb.bucket") === sk("bucket"),
        "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
