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
    val del = deletions.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().persist()

    // pack_seq: sequences overlapped by deleted docs.
    val packs = packsIn
      .select(col("doc_id"), col("shard"), col("seq_first"), col("seq_last"))
      .persist()
    val seqAll = packs
      .select(col("shard"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .distinct().count()
    val delPacks = packs.join(del, "doc_id").persist()
    val seqTouched = delPacks
      .select(col("shard"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .distinct().count()
    val docsDeleted = delPacks.count()
    delPacks.unpersist(); packs.unpersist()

    // epoch_suffix: per touched shard, every position at/after the
    // first deleted one re-derives. Pin a narrow projection first: the
    // caller's order table may be a raw (unpersisted) parquet read, and
    // the five actions below would otherwise rescan it five times.
    val o = ord.select(col("shard"), col("pos"), col("doc_id")).persist()
    val delOrd = o.join(del, "doc_id").persist()
    val mins = delOrd.groupBy(col("shard"))
      .agg(min(col("pos")).as("mp")).persist()
    val suffixRows = o.join(mins, "shard")
      .filter(col("pos") >= col("mp")).count()
    val ordTotal = o.count()
    val shardsTotal = o.select(col("shard")).distinct().count()
    val shardsTouched = mins.count()
    val epochDeleted = delOrd.count()
    mins.unpersist(); delOrd.unpersist(); o.unpersist()

    // ivf_cell: posting lists containing deleted vectors.
    val cells = cellsIn
      .select(col("vec_id"), col("cell")).persist()
    val cellsTotal = cells.select(col("cell")).distinct().count()
    val delCells = cells
      .join(del, cells("vec_id") === del("doc_id")).persist()
    val cellsTouched = delCells.select(col("cell")).distinct().count()
    val vecsDeleted = delCells.count()
    delCells.unpersist(); cells.unpersist(); del.unpersist()

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
