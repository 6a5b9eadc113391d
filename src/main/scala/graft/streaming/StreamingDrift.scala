package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor — the incremental form of the
  * batch per-source Hellinger audit (`operators.Curation
  * .hellingerBySource`): as documents arrive, maintain each source's
  * token distribution and re-emit its squared Hellinger distance from
  * a FIXED reference distribution (e.g. the curated blend the mixing
  * weights were tuned on). The alert a corpus-ingest pipeline fires
  * when a feed's language shifts mid-crawl.
  *
  * Bounded state by construction: tokens hash into `buckets` md5-stable
  * slots (the DSIR feature-hash trick), so per-source state is exactly
  * `buckets` longs — vocabulary growth cannot grow the checkpoint. The
  * reference distribution is the same bucketed form, captured once
  * from a batch snapshot via [[StreamingDrift.bucketDistribution]].
  *
  * Scale shape: the tokenize+hash map is narrow; the only shuffle is
  * the groupByKey on source (|sources| keys — tiny); state lives in
  * the state store and recovers from checkpoints like any stateful
  * query. Emits in Update mode: one row per source per batch in which
  * that source saw data.
  */
object StreamingDrift {

  case class SourceState(counts: Array[Long], total: Long)
  case class Drift(src: String, n_tokens: Long, hellinger2: Double)

  /** Stable token→bucket hash (md5 low bits, as in operators.Dsir).
    * The digest instance is caller-supplied so the hot per-token loops
    * reuse ONE instance per partition (Dedup.simhashesMd5's pattern) —
    * a fresh getInstance per token would pay a JCA provider lookup and
    * two allocations per occurrence in the only CPU-heavy stage.
    */
  def bucket(md: java.security.MessageDigest, token: String, buckets: Int): Int = {
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % buckets).toInt
  }

  /** One-shot form for tests/small inputs. */
  def bucket(token: String, buckets: Int): Int =
    bucket(java.security.MessageDigest.getInstance("MD5"), token, buckets)

  /** Bucketed distribution of a batch token iterator — the reference
    * snapshot `drift` compares against (probabilities, not counts).
    */
  def bucketDistribution(tokens: Iterator[String], buckets: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val c = new Array[Long](buckets)
    var n = 0L
    tokens.foreach { t => c(bucket(md, t, buckets)) += 1; n += 1 }
    if (n == 0) new Array[Double](buckets)
    else c.map(_.toDouble / n)
  }

  /** H²(p, q) = ½·Σ (√p − √q)² over bucket distributions. */
  private[graft] def hellinger2(counts: Array[Long], total: Long,
                                ref: Array[Double]): Double = {
    if (total == 0) 0.0
    else {
      var acc = 0.0
      var i = 0
      while (i < counts.length) {
        val d = math.sqrt(counts(i).toDouble / total) - math.sqrt(ref(i))
        acc += d * d
        i += 1
      }
      acc * 0.5
    }
  }

  /** (source, text) stream → per-batch updated drift per source.
    *
    * @param ref bucketed reference distribution (length = `buckets`),
    *            from [[bucketDistribution]] over the curated corpus
    */
  def drift(docs: Dataset[(String, String)], ref: Array[Double],
            buckets: Int = 256): Dataset[Drift] = {
    require(ref.length == buckets, s"ref length ${ref.length} != $buckets")
    import docs.sparkSession.implicits._
    docs
      // Partition-local combine BEFORE the keyed shuffle: the exchange
      // carries at most sources×buckets×partitions (src, bucket, n)
      // rows instead of one row per token occurrence — a dominant
      // source cannot funnel its whole batch through one state task's
      // input stream.
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val m = scala.collection.mutable.HashMap.empty[(String, Int), Long]
        it.foreach { case (src, text) =>
          graft.operators.TextAnalysis.tokenize(text).foreach { w =>
            val k = (src, bucket(md, w, buckets))
            m(k) = m.getOrElse(k, 0L) + 1L
          }
        }
        m.iterator.map { case ((src, b), n) => (src, b, n) }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[SourceState, Drift](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (src, rows, state: GroupState[SourceState]) =>
          val st0 = state.getOption
            .getOrElse(SourceState(new Array[Long](buckets), 0L))
          val counts = st0.counts.clone()
          var total = st0.total
          rows.foreach { case (_, b, n) => counts(b) += n; total += n }
          state.update(SourceState(counts, total))
          Iterator.single(Drift(src, total, hellinger2(counts, total, ref)))
      }
  }
}
