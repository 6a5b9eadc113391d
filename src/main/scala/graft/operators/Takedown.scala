package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-impact audit — the planning step of a takedown /
  * right-to-be-forgotten request against a training-data pipeline:
  * given a deletion set of document ids, report how much of each
  * DERIVED artifact must be rebuilt before any bytes are touched.
  *
  * Three artifact families (the ones a real corpus materializes):
  *  - `pack_seq`: fixed-budget token sequences ([[Packing.packSequences]])
  *    — a deleted doc invalidates every sequence its span overlaps;
  *  - `epoch_suffix`: the deterministic epoch order
  *    ([[EpochShuffle.order]]) — positions are dense per shard, so a
  *    deletion shifts every LATER position in its shard; the rebuild is
  *    each touched shard's suffix from its first deleted position;
  *  - `ivf_cell`: ANN index cells ([[Clustering.kmeansAssign]]) — a
  *    deleted vector invalidates its cell's posting list.
  *
  * Scale shape: three joins against the (small) deletion set plus
  * count aggregates; the only driver-side values are the dozen scalar
  * counts that form the 3-row report. Nothing corpus-sized leaves the
  * executors.
  *
  * Output: (artifact, units_touched, units_total, rows_deleted,
  * rebuild_frac) — rebuild_frac is the fraction of the artifact's BASE
  * rows/units invalidated, in the divergence-free floor-scaled form
  * (oracle-dialect rule 9).
  */
object Takedown {

  def impactAudit(docs: DataFrame, embeddings: DataFrame,
      deletions: DataFrame, seed: String = "ep7", shards: Int = 8,
      budget: Int = 512, kCells: Int = 8): DataFrame = {
    val packs = Packing.packSequences(docs, col("doc_id"), col("text"),
        budget, shards)
      .select(col("doc_id"), col("shard"), col("seq_first"), col("seq_last"))
    // Nested try/finally: order() and kmeansAssign() both return
    // CACHED frames, and an exception between building and auditing
    // must not strand a corpus-sized cache (the aa87feb leak class).
    val ord = EpochShuffle.order(docs, col("doc_id"), seed, shards)
    try {
      val asg = Clustering.kmeansAssign(embeddings, k = kCells, updates = 1)
      try impactAuditPrebuilt(packs, ord,
        asg.select(col("vec_id"), col("cell")), deletions)
      finally asg.unpersist()
    } finally ord.unpersist()
  }

  /** The deployment form of [[impactAudit]]: audit the artifacts a
    * corpus has ALREADY materialized (pack table, epoch-order table,
    * ANN cell assignment) instead of rebuilding them — at 100 TB the
    * artifacts exist on disk and the audit is three joins against the
    * broadcast-scale deletion set, not three corpus pipelines. The
    * gate query keeps the rebuild form so the oracle can replay the
    * artifact construction; real callers read parquet and come here.
    *
    * @param packs (doc_id, shard, seq_first, seq_last) — [[Packing.packSequences]] shape
    * @param ord   (shard, pos, doc_id[, …]) — [[EpochShuffle.order]] shape
    * @param cells (vec_id, cell) — [[Clustering.kmeansAssign]] shape
    */
  def impactAuditPrebuilt(packsIn: DataFrame, ord: DataFrame,
      cellsIn: DataFrame, deletions: DataFrame): DataFrame = {
    val spark = packsIn.sparkSession
    import spark.implicits._
    // distinct: overlapping takedown requests may repeat an id, and a
    // duplicate would inflate rows_deleted via join multiplication
    // while the distinct-based units stay put — an internally
    // inconsistent report.
    //
    // r11 shape (guide §1.2/§2.3): each artifact family is ONE
    // left-join-marked pass + a two-level aggregate (group to the unit
    // key carrying a touched flag, then a 1-row rollup) instead of a
    // separate distinct-count job per scalar — the report's eleven
    // driver actions collapse to five, and the distinct exchanges fold
    // into the unit-key groupBys. Every scalar is the same value the
    // multi-job form computed (del is distinct, so the left join marks
    // rows 1:1 without multiplying them).
    val del = deletions.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().withColumn("__del", lit(true)).persist()

    // The three artifact families are data-independent once `del` is
    // cached, so their jobs run from a 3-thread pool (guide §2.6:
    // overlap independent actions so one family's tasks back-fill the
    // executor slots another family's stage tail leaves idle). Spark's
    // scheduler is explicitly multi-job-safe; the only shared frame is
    // the cached `del`, whose first materialization is lock-protected
    // by the block manager.
    //
    // r12 (ADVICE r11): daemon threads so an orphaned family can never
    // pin JVM exit; each family tags its jobs with a shared job group
    // so the failure path can CANCEL the in-flight siblings instead of
    // letting them run on unobserved.
    val sc = spark.sparkContext
    val group = s"takedown-audit-${java.util.UUID.randomUUID}"
    val tf = new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"takedown-audit-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3, tf)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    def inGroup[T](body: => T): T = {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      sc.setJobGroup(group, "takedown impact audit",
        interruptOnCancel = false)
      try body finally sc.clearJobGroup()
    }

    // pack_seq: sequences overlapped by deleted docs. One exploded
    // pass: group to the (shard, seq) unit, keep whether ANY covering
    // pack row was deleted, then count units and touched units in a
    // single rollup.
    val packF = scala.concurrent.Future { inGroup {
      val packs = packsIn
        .select(col("doc_id"), col("shard"), col("seq_first"), col("seq_last"))
        .join(del, Seq("doc_id"), "left")
        .select(col("shard"), col("seq_first"), col("seq_last"),
          coalesce(col("__del"), lit(false)).as("isdel"))
        .persist()
      try {
        val docsDeleted = packs.filter(col("isdel")).count()
        val seqRow = packs
          .select(col("isdel"), col("shard"),
            explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
          .groupBy(col("shard"), col("seq"))
          .agg(max(col("isdel")).as("touched"))
          .agg(count(lit(1)).as("all"),
            count(when(col("touched"), lit(1))).as("touched"))
          .head()
        (docsDeleted, seqRow.getLong(0), seqRow.getLong(1))
      } finally packs.unpersist()
    } }

    // epoch_suffix: per touched shard, every position at/after the
    // first deleted one re-derives. One narrow marked projection; the
    // per-shard aggregate carries (rows, deleted rows, first deleted
    // pos) so the four scalars fall out of a 1-row rollup, and only
    // the suffix count needs a second (broadcast-joined) pass.
    val epochF = scala.concurrent.Future { inGroup {
      val o = ord.select(col("shard"), col("pos"), col("doc_id"))
        .join(del, Seq("doc_id"), "left")
        .select(col("shard"), col("pos"),
          coalesce(col("__del"), lit(false)).as("isdel"))
        .persist()
      try {
        val perShard = o.groupBy(col("shard"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("isdel"), lit(1L)).otherwise(lit(0L))).as("ndel"),
            min(when(col("isdel"), col("pos"))).as("mp"))
          .persist()
        try {
          val shardRow = perShard
            .agg(coalesce(sum(col("n")), lit(0L)).as("ordTotal"),
              count(lit(1)).as("shardsTotal"),
              count(col("mp")).as("shardsTouched"),
              coalesce(sum(col("ndel")), lit(0L)).as("epochDeleted"))
            .head()
          val suffixRows = o.join(
              broadcast(perShard.filter(col("mp").isNotNull)
                .select(col("shard"), col("mp"))), "shard")
            .filter(col("pos") >= col("mp")).count()
          (shardRow.getLong(0), shardRow.getLong(1), shardRow.getLong(2),
            shardRow.getLong(3), suffixRows)
        } finally perShard.unpersist()
      } finally o.unpersist()
    } }

    // ivf_cell: posting lists containing deleted vectors — one marked
    // pass grouped to the cell unit, 1-row rollup.
    val cellF = scala.concurrent.Future { inGroup {
      cellsIn
        .select(col("vec_id"), col("cell"))
        .join(del, col("vec_id") === del("doc_id"), "left")
        .select(col("cell"), coalesce(col("__del"), lit(false)).as("isdel"))
        .groupBy(col("cell"))
        .agg(max(col("isdel")).as("touched"),
          sum(when(col("isdel"), lit(1L)).otherwise(lit(0L))).as("ndel"))
        .agg(count(lit(1)).as("cellsTotal"),
          count(when(col("touched"), lit(1))).as("cellsTouched"),
          coalesce(sum(col("ndel")), lit(0L)).as("vecsDeleted"))
        .head()
    } }

    // r12 (ADVICE r11): Duration.Inf — a hard-coded 600 s ceiling
    // turned a legitimately slow 100 TB audit into a TimeoutException
    // with its in-flight jobs uncancelled and its caches stranded. On
    // ANY failure: cancel the sibling families' running jobs via the
    // shared job group, kill the (daemon) pool with shutdownNow, and
    // release `del` in a finally so the 'aa87feb leak class' cannot
    // re-enter through this path.
    val (docsDeleted, seqAll, seqTouched,
        ordTotal, shardsTotal, shardsTouched, epochDeleted, suffixRows,
        cellsTotal, cellsTouched, vecsDeleted) =
      try {
        val inf = scala.concurrent.duration.Duration.Inf
        val (a, b, c) = scala.concurrent.Await.result(packF, inf)
        val (d2, e2, f2, g2, h2) = scala.concurrent.Await.result(epochF, inf)
        val cellRow = scala.concurrent.Await.result(cellF, inf)
        pool.shutdown()
        (a, b, c, d2, e2, f2, g2, h2,
          cellRow.getLong(0), cellRow.getLong(1), cellRow.getLong(2))
      } catch { case t: Throwable =>
        try sc.cancelJobGroup(group) catch { case _: Exception => () }
        pool.shutdownNow()
        throw t
      } finally del.unpersist()

    def f6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // Empty corpus / artifact family: 0/0 would be NaN (and floor(NaN)
    // stays NaN) — an empty family touched nothing, so report 0.0.
    def frac(touched: Long, total: Long): Double =
      if (total == 0L) 0.0 else f6(touched.toDouble / total)
    Seq(
      ("pack_seq", seqTouched, seqAll, docsDeleted,
        frac(seqTouched, seqAll)),
      ("epoch_suffix", shardsTouched, shardsTotal, epochDeleted,
        frac(suffixRows, ordTotal)),
      ("ivf_cell", cellsTouched, cellsTotal, vecsDeleted,
        frac(cellsTouched, cellsTotal)))
      .toDF("artifact", "units_touched", "units_total", "rows_deleted",
        "rebuild_frac")
  }
}
