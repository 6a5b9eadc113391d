package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** Streaming maintenance of an at-rest count-min sketch — the
  * incremental form of `operators.CountMin`, tiered like the at-rest
  * ANN indexes (base + streaming delta + offline compaction).
  *
  * Each micro-batch reduces to its own d·w partial sketch and is
  * written to `delta/batch=<id>` with overwrite: a retried batch
  * rewrites the same directory, so counters are exactly-once under
  * any failure/replay (the epoch-fencing idiom of the journal sink —
  * an append-mode write of per-batch counts would double-count on
  * retry, and a streaming aggregation can't use the file sink at all).
  * Readers sum base ∪ unfolded delta — sketches merge by addition, so
  * the tiering is lossless. Unlike row-level tiers, folding COUNTS
  * must be exactly-once too, so compaction never renames or deletes
  * live data on its commit path: each compact writes an immutable
  * `base_v<upto>` directory whose `_upto` marker (written last) is the
  * commit record; readers take the highest committed version and
  * exclude delta batches ≤ its watermark; superseded versions and
  * folded delta directories are deleted afterwards as pure cleanup. A
  * crash at ANY point leaves every counter counted exactly once.
  * State anywhere in the pipeline is at most d·w counters per tier,
  * whatever the vocabulary or stream length.
  */
object StreamingCountMin {

  /** One batch's partial sketch → `delta/batch=<id>` (overwrite ⇒
    * idempotent under retry). Exposed for the retry-idempotence spec.
    */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long,
      item: Column, d: Int, w: Int, path: String): Unit =
    CountMin.sketch(batch, item, d, w)
      .write.mode("overwrite").parquet(s"$path/delta/batch=$batchId")

  /** Continuously fold an item stream into the sketch at `path`. */
  def ingest(items: DataFrame, item: Column, d: Int, w: Int,
      path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    items.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) writeBatch(batch, batchId, item, d, w, path)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  private def hfs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, p: String): Boolean =
    hfs(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  /** The delta tier as a DataFrame — None when no batch directory
    * exists (after a full compaction the bare `delta/` root remains,
    * and reading it would fail schema inference).
    */
  private def deltaDf(spark: SparkSession, path: String)
      : Option[DataFrame] = {
    val sts = hfs(spark, path)
      .globStatus(new org.apache.hadoop.fs.Path(s"$path/delta/batch=*"))
    if (sts == null || sts.isEmpty) None
    else Some(spark.read.option("basePath", s"$path/delta")
      .parquet(s"$path/delta"))
  }

  /** Committed base versions (ascending): dirs `base_v<N>` whose
    * `_upto` marker exists. N is the highest delta batch id folded in.
    */
  private def committedVersions(spark: SparkSession, path: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val f = hfs(spark, path)
    f.globStatus(new Path(s"$path/base_v*")) match {
      case null => Nil
      case sts => sts.toSeq
        .map(_.getPath)
        .filter(p => f.exists(new Path(p, "_upto")))
        .map(_.getName.stripPrefix("base_v").toLong)
        .sorted
    }
  }

  /** The merged counter table (j, bucket, c): newest committed base ∪
    * every delta batch past its watermark, summed.
    */
  def counters(spark: SparkSession, path: String): DataFrame = {
    val upto = committedVersions(spark, path).lastOption.getOrElse(-1L)
    val base =
      if (upto >= 0)
        Some(spark.read.parquet(s"$path/base_v$upto")
          .select(col("j"), col("bucket"), col("c")))
      else None
    val delta = deltaDf(spark, path).map(_
      .filter(col("batch") > upto)
      .select(col("j"), col("bucket"), col("c")))
    val tiers = base.toSeq ++ delta.toSeq
    require(tiers.nonEmpty, s"no sketch tiers under $path")
    tiers.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
  }

  /** Point estimates for `probes` against the live sketch. */
  def estimate(spark: SparkSession, path: String, probes: DataFrame,
      item: Column, d: Int, w: Int): DataFrame =
    CountMin.estimate(counters(spark, path), probes, item, d, w)

  /** Fold unfolded delta batches into a new committed base version,
    * then clean up superseded versions and folded delta directories.
    * Deletion is one generation DEFERRED: the immediately previous
    * base (and its delta tail) survive this compact so a reader that
    * planned against them mid-compact can still execute; a version
    * dies only once superseded twice. Orphan bases from a compact
    * that crashed pre-marker are swept here too.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val before = committedVersions(spark, path)
    val upto = before.lastOption.getOrElse(-1L)
    // The fold NEVER includes the newest present delta batch: ingest is
    // a single sequential query, so the only directory that can be
    // mid-write when this compact lists the tier is the
    // highest-numbered one (a fresh batch, or a checkpoint replay
    // overwriting the last batch). Folding a partially-visible batch
    // and watermarking past it would exclude its remaining files from
    // every future read — silent undercount. Excluding the max id
    // keeps it in the delta tier (still counted by readers) until a
    // later batch proves it complete.
    //
    // ONE listing decides both the watermark AND the fold input: the
    // fold reads exactly the batch directories this listing saw below
    // newUpto. A separate whole-tier DataFrame snapshot taken earlier
    // (the previous shape) could predate the commit of a batch this
    // listing then watermarks past — partially-folded counts excluded
    // from every future read, the exact undercount the max-exclusion
    // rule exists to prevent.
    val pendingIds = {
      val f = hfs(spark, path)
      f.globStatus(new Path(s"$path/delta/batch=*")) match {
        case null => Seq.empty[Long]
        case sts => sts.toSeq.map(_.getPath.getName.stripPrefix("batch=").toLong)
          .filter(_ > upto).sorted
      }
    }
    if (pendingIds.size < 2) return // nothing PROVABLY complete to fold
    val newUpto = pendingIds(pendingIds.size - 2)
    // Fold EXACTLY (upto, newUpto]: a batch the ingest query lands
    // while this compact runs stays in the delta tier (it is above the
    // new watermark), so concurrent ingest never double-counts. All
    // folded dirs were non-max at listing time, hence fully committed
    // (immutable: replays only ever overwrite the newest batch).
    val base =
      if (upto >= 0)
        Some(spark.read.parquet(s"$path/base_v$upto")
          .select(col("j"), col("bucket"), col("c")))
      else None
    val folded = spark.read
      .option("basePath", s"$path/delta")
      .parquet(pendingIds.filter(_ <= newUpto)
        .map(id => s"$path/delta/batch=$id"): _*)
      .select(col("j"), col("bucket"), col("c"))
    (base.toSeq :+ folded).reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
      .write.mode("overwrite").parquet(s"$path/base_v$newUpto")
    val f = hfs(spark, path)
    // Commit point: the marker's existence publishes the new version.
    f.create(new Path(s"$path/base_v$newUpto/_upto"), true).close()
    // Retention: keep the PREVIOUS committed version (and its folded
    // delta dirs) one generation — a reader that planned `base_v<upto>
    // ∪ delta > upto` before this commit can still run its action;
    // only versions superseded twice are deleted. Also sweep orphan
    // base_v* dirs (no _upto marker) left by a compact that crashed
    // between the parquet write and the marker — they are invisible to
    // readers but would otherwise accumulate forever.
    for (v <- before.dropRight(1)) f.delete(new Path(s"$path/base_v$v"), true)
    f.globStatus(new Path(s"$path/base_v*")) match {
      case null =>
      case sts => sts.toSeq.map(_.getPath)
        .filter { p =>
          val v = p.getName.stripPrefix("base_v").toLong
          v < newUpto && !f.exists(new Path(p, "_upto"))
        }
        .foreach(f.delete(_, true))
    }
    // The delta-cleanup watermark IS the fold floor bound above — one
    // value, not two derivations that could silently decouple.
    val prevUpto = upto
    f.globStatus(new Path(s"$path/delta/batch=*")) match {
      case null =>
      case sts => sts.toSeq.map(_.getPath)
        .filter(_.getName.stripPrefix("batch=").toLong <= prevUpto)
        .foreach(f.delete(_, true))
    }
  }
}
