package graft.metrics

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-streaming-query metrics — the engine's analog of the
  * reference's per-shard consumer counters (consumer/interfaces.go:
  * 306-339: `gazette_shard_transactions_total`,
  * `gazette_shard_read_messages_total`, `gazette_shard_read_head`,
  * `gazette_shard_up`). A Spark micro-batch is the txn unit, so:
  *
  *  - `query.<name>.batches` — completed micro-batches (txn counter).
  *  - `query.<name>.rows` — input rows across completed batches.
  *  - `query.<name>.read.head.<i>` — gauge per source: the journal
  *    byte offset read through (parsed from the source's endOffset
  *    JSON `{"head":N}`; non-journal sources without a numeric head
  *    are skipped).
  *  - `query.<name>.active` — 1 while the query runs, 0 after
  *    termination (`gazette_shard_up`).
  *  - `query.<name>.observed.<metric>.<field>` — every
  *    `df.observe(...)` aggregate accumulated batch-over-batch (the
  *    ingest guard's `graft_guard` checked/quarantined counts arrive
  *    here).
  *
  * Attach once per session via [[GraftMetrics.attachListener]].
  * Unnamed queries fall back to their stable query id. Two queries
  * RUNNING CONCURRENTLY under the same display name would merge
  * counters silently, so the second-comer's key gets an id suffix
  * (`<name>-<id8>`) while the clash lasts; a restart of the same
  * query (previous run terminated) keeps the bare name and its
  * counters continue.
  */
class GraftStreamingListener extends StreamingQueryListener {
  import StreamingQueryListener._

  private def nameOf(name: String, id: java.util.UUID): String =
    if (name != null && name.nonEmpty) name else id.toString

  // TerminatedEvent carries only ids: remember each query's metric
  // key so `active` flips to 0 under the same key it was set under
  // (and so progress events reuse the clash-suffixed key). JVM-global
  // (companion), not per-listener: the metric REGISTRY is JVM-global,
  // and the clash case is precisely two SESSIONS running same-named
  // queries (one session's manager already forbids duplicate active
  // names), each with its own listener instance. Values carry the
  // RUN id: a restart's StartedEvent is synchronous while the old
  // run's TerminatedEvent is async, so the stale entry (same query
  // id, older runId) must neither read as a name clash nor let the
  // late event clobber the restarted query's active flag.
  private def names = GraftStreamingListener.names

  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    val base = nameOf(e.name, e.id)
    val q = names.synchronized {
      val mine = names.get(e.id)
      val key =
        if (mine != null) mine._2 // restart: keep the key, adopt the run
        else {
          val it = names.values().iterator()
          var clash = false
          while (it.hasNext && !clash) clash = it.next()._2 == base
          if (clash) s"$base-${e.id.toString.take(8)}" else base
        }
      names.put(e.id, (e.runId, key))
      key
    }
    GraftMetrics.setGauge(s"query.$q.active", 1L)
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    names.synchronized {
      val v = names.get(e.id)
      if (v == null) // never saw the start: best-effort under the id
        GraftMetrics.setGauge(s"query.${e.id}.active", 0L)
      else if (v._1 == e.runId) { // the CURRENT run ended
        names.remove(e.id)
        GraftMetrics.setGauge(s"query.${v._2}.active", 0L)
      } // else: stale event from a superseded run — the query
        // restarted already; it is up, leave the flag alone.
    }
  }

  private val headRe = """"head"\s*:\s*(\d+)""".r

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val q = {
      val v = names.get(p.id)
      if (v != null) v._2 else nameOf(p.name, p.id)
    }
    GraftMetrics.counter(s"query.$q.batches").inc()
    GraftMetrics.counter(s"query.$q.rows").inc(p.numInputRows)
    p.sources.zipWithIndex.foreach { case (s, i) =>
      val end = s.endOffset
      if (end != null) headRe.findFirstMatchIn(end).foreach { m =>
        GraftMetrics.maxGauge(s"query.$q.read.head.$i", m.group(1).toLong)
      }
    }
    // Observed metrics: one Row of aggregates per observe() name; fold
    // each numeric field into a counter so totals accumulate across
    // batches (observe values are per-batch, counters are lifetime).
    val om = p.observedMetrics
    if (om != null) {
      val it = om.entrySet().iterator()
      while (it.hasNext) {
        val entry = it.next()
        val row = entry.getValue
        val schema = row.schema
        if (schema != null) schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) row.get(i) match {
            case n: Number => GraftMetrics
              .counter(s"query.$q.observed.${entry.getKey}.${f.name}")
              .inc(n.longValue)
            case _ => ()
          }
        }
      }
    }
  }
}

object GraftStreamingListener {
  // query id -> (current runId, metric key)
  private val names = new java.util.concurrent.ConcurrentHashMap[
    java.util.UUID, (java.util.UUID, String)]()
}
