package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order materialization: assign every document
  * a (shard, position) for one training epoch, where both the shard
  * assignment and the within-shard order are pure functions of
  * (seed, doc_id). The data-loader contract behind large-scale LM
  * training: N reader workers each stream one shard in a fixed
  * pseudo-random order, any worker can be restarted mid-epoch and
  * resume at its position, and re-running the job (or re-growing the
  * corpus and re-running) never reorders rows it doesn't have to.
  * Changing the seed re-deals the whole epoch — the per-epoch shuffle.
  *
  * RNG-free by design (house rule): shard = md5("s:" seed ":" id)
  * mod shards, order key = md5("o:" seed ":" id) — independent salts so
  * the within-shard order shares no bits with the shard choice. Both
  * replay exactly in the DuckDB oracle.
  *
  * Scale design (100 TB): positions are a per-shard dense rank, and
  * the classic row_number() OVER (PARTITION BY shard ORDER BY key)
  * sorts each shard under ONE window task — with realistic shard
  * counts (tens to hundreds) that is a corpus-sized sort on a handful
  * of reducers. This uses the two-phase global-rank form instead
  * (same machinery as [[SortedNeighborhood]]): range-repartition by
  * (shard, key) + in-partition sort, per-partition local index, a
  * P-row count collect whose cumulative offsets broadcast back, then
  * per-shard bases (an S-row aggregate) subtract away to yield dense
  * per-shard positions. The range partitioner's sampled boundaries
  * only move partition EDGES; the (shard, key) total order — and so
  * every rank — is unaffected.
  *
  * Fault-tolerance note for cluster deployments: the collected offsets
  * are only valid for the materialization they were counted from. On
  * local/disk-backed caching that is guaranteed; on a cluster where
  * executor loss can evict cached partitions, lineage replay would
  * re-sample range boundaries and shift (pid, li) — checkpoint the
  * result (reliable storage) instead of relying on the cache before
  * releasing it.
  */
object EpochShuffle {

  /** The engine's seeded shard assignment: first 8 md5 hex digits of
    * "s:seed:id" mod `shards`. THE single definition — batch epochs,
    * [[graft.streaming.StreamingOrder]], and every DuckDB oracle
    * replaying `('0x' || substr(md5(...), 1, 8))::UBIGINT % n` must
    * agree bit-for-bit.
    */
  def shardOf(id: Column, seed: String, shards: Int): Column =
    (conv(substring(md5(concat(lit("s:" + seed + ":"),
      id.cast("string"))), 1, 8), 16, 10).cast("long")
      % shards).cast("int")

  /** The engine's seeded order key md5("o:seed:id") — the RNG-free
    * total order shared by epoch shuffles, mixture-manifest prefixes
    * ([[Curation.executeMixturePlan]]), and the streaming order.
    * (The epoch-tagged variant md5("o:seed:epoch:id") in
    * [[Curation.executeEpochPlan]] extends the same convention with a
    * per-pass tag.)
    */
  def orderKeyOf(id: Column, seed: String): Column =
    md5(concat(lit("o:" + seed + ":"), id.cast("string")))

  /** One epoch's (shard, pos, doc_id) order table. `id` values must be
    * unique (they are the identity of a document); the md5 order key
    * then has no ties and the order is total.
    */
  def order(df: DataFrame, id: Column, seed: String, shards: Int): DataFrame = {
    // Re-cache the projection and release the wider frame: unpersist on
    // a Project OVER the cached plan is a silent no-op (Dataset
    // .unpersist only drops plans sameResult with its own), so
    // returning `wp.drop(...)` would leave callers unable to ever free
    // the corpus-sized epoch cache.
    val wp = orderWithPriority(df, id, lit(0), seed, shards)
    val out = wp.drop("priority")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    wp.unpersist()
    out
  }

  /** Curriculum variant: order each shard by (`priority` ASC, md5 key)
    * — lower priority values stream first (e.g. CCNet bucket rank:
    * head = 0 before middle = 1 before tail = 2), with the seeded
    * pseudo-random order breaking ties WITHIN a priority class. The
    * data-loader contract is unchanged; the epoch simply walks the
    * curriculum. Returns (shard, pos, doc_id, priority).
    */
  def orderWithPriority(df: DataFrame, id: Column, priority: Column,
      seed: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._

    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val keyed = df.select(id.cast("long").as("doc_id"),
        priority.cast("int").as("priority"))
      .withColumn("shard", shardOf(col("doc_id"), seed, shards))
      .withColumn("okey", orderKeyOf(col("doc_id"), seed))
    val local = keyed
      .repartitionByRange(parts, col("shard"), col("priority"), col("okey"))
      .sortWithinPartitions(col("shard"), col("priority"), col("okey"))
      .select(col("shard"), col("priority"), col("okey"), col("doc_id"))
      .as[(Int, Int, String, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0L
        it.map { case (sh, pr, k, d) => val r = (pid, i, sh, pr, k, d); i += 1; r }
      }.toDF("pid", "li", "shard", "priority", "okey", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // P rows to the driver; cumulative counts become global rank offsets.
    val counts = local.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "off")
    val ranked = local.join(broadcast(offDf), "pid")
      .select(col("shard"), col("priority"), col("doc_id"),
        (col("off") + col("li")).as("rk"))
    // Dense per-shard positions: subtract each shard's first global rank.
    val bases = ranked.groupBy(col("shard")).agg(min(col("rk")).as("base"))
    // The collected offsets are only valid for the materialization they
    // were counted from (a recompute could re-sample range boundaries
    // and shift every (pid, li)), so `local` must stay persisted until
    // the RESULT is materialized — persist the result, force it, then
    // release the wider intermediate. The returned frame is cached;
    // callers done with the epoch may unpersist() it.
    val out = ranked.join(broadcast(bases), "shard")
      .select(col("shard"), (col("rk") - col("base")).as("pos"), col("doc_id"),
        col("priority"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    local.unpersist()
    out
  }

  /** Audit whether each global batch actually mixes sources the way
    * the corpus does: for every consecutive `batchSize` window of an
    * [[order]] (batch b = positions [b·B, (b+1)·B) within a shard —
    * what one data-parallel worker reads per step), report the total
    * variation distance between the batch's source histogram and the
    * corpus-wide one, as the INTEGER numerator
    * `tvd_num = Σ_s |N·c_{b,s} − n_b·C_s|` (the TVD is
    * tvd_num / (2·N·n_b); keeping the integer form makes the audit
    * replayable bit-for-bit with no float rounding). Also reports the
    * most over-represented present source per batch. A healthy seeded
    * shuffle keeps tvd_num near the multinomial-sampling floor; a
    * spike flags order bugs (e.g. a sort that grouped a source).
    *
    * Scale shape: one doc_id equi-join of the order against the
    * source map, one (shard, batch, source) hash aggregate, per-batch
    * windows bounded by |sources| rows, and the |sources|-row corpus
    * histogram broadcast. Nothing corpus-sized reaches the driver.
    */
  def batchMixAudit(order: DataFrame, docs: DataFrame, id: Column,
      source: Column, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val src = docs.select(id.cast("long").as("doc_id"),
      source.cast("string").as("source"))
    val corpus = src.groupBy(col("source")).agg(count(lit(1)).as("c_s"))
    val n = corpus.agg(sum(col("c_s")).as("n_total"))
    val cbs = order.join(src, "doc_id")
      .withColumn("batch", expr(s"pos div $batchSize"))
      .groupBy(col("shard"), col("batch"), col("source"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(corpus), "source")
      .crossJoin(broadcast(n))
    val wBatch = Window.partitionBy(col("shard"), col("batch"))
    val wDev = Window.partitionBy(col("shard"), col("batch"))
      .orderBy(col("__dev").desc, col("source"))
    cbs
      .withColumn("n_b", sum(col("c")).over(wBatch))
      .withColumn("__dev", col("n_total") * col("c") - col("n_b") * col("c_s"))
      .withColumn("__present_cs", sum(col("c_s")).over(wBatch))
      // Σ over PRESENT sources of |N·c − n_b·C_s|, plus the absent
      // sources' contribution n_b·(N − Σ_present C_s) — every absent
      // source is purely under-represented.
      .withColumn("__tvd", sum(abs(col("__dev"))).over(wBatch) +
        col("n_b") * (col("n_total") - col("__present_cs")))
      .withColumn("__rn", row_number().over(wDev))
      .filter(col("__rn") === 1)
      .select(col("shard"), col("batch"), col("n_b").cast("long").as("n_docs"),
        col("__tvd").cast("long").as("tvd_num"),
        col("source").as("worst_source"), col("__dev").cast("long").as("worst_dev"))
  }
}
