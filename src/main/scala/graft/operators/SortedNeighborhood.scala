package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood record linkage (Hernández & Stolfo 1995): sort
  * the distinct keys once, then compare each key only against its
  * `window - 1` successors in sort order. The complementary blocking
  * strategy to [[FuzzyJoin.selfJoin]]'s length bands: length banding
  * bounds the candidate set by an edit-distance-implied invariant
  * (lossless for its threshold), sorted neighborhood bounds it by sort
  * locality (lossy, but catches same-prefix variants that differ in
  * length by more than the band).
  *
  * Scale design (100 TB): NO global single-partition window. The
  * global rank is the standard two-phase form — range-repartition +
  * in-partition sort, a per-partition local index (narrow, imperative
  * per-partition logic), and a P-row partition-count collect whose
  * cumulative offsets broadcast back. Candidate generation is then an
  * equi-join on consecutive rank values (rank+o = rank2, o < window) —
  * a hash join on integers, never a cross join; levenshtein runs on
  * candidates only. Three shuffles total (distinct, range exchange,
  * rank join), each on key-or-int-sized rows.
  *
  * Determinism: ranks follow the total key order (ties impossible on
  * distinct keys); the range partitioner's sampling only moves
  * partition BOUNDARIES, which cannot change the global rank.
  */
object SortedNeighborhood {

  /** Distinct-key neighbor pairs (a < b in sort order) within the
    * sliding window, with their edit distance, filtered to
    * `maxDist`. Returns (a, b, dist).
    */
  def pairs(df: DataFrame, key: Column, window: Int,
      maxDist: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val spark = df.sparkSession
    import spark.implicits._

    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val local = df.select(key.cast("string").as("k")).distinct()
      .repartitionByRange(parts, col("k"))
      .sortWithinPartitions(col("k"))
      .as[String].mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0L
        it.map { k => val r = (pid, i, k); i += 1; r }
      }.toDF("pid", "li", "k")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // P rows to the driver; cumulative counts become rank offsets.
    val counts = local.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "off")
    val ranked = local.join(broadcast(offDf), "pid")
      .select(col("k"), (col("off") + col("li")).as("rk"))
    val lefts = ranked.withColumn("o",
      explode(array((1 until window).map(o => lit(o.toLong)): _*)))
    val rights = ranked.select(col("rk").as("rk2"), col("k").as("b"))
    val out = lefts
      .join(rights, lefts("rk") + lefts("o") === rights("rk2"))
      .select(col("k").as("a"), col("b"),
        levenshtein(col("k"), col("b")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
    out
  }
}
