package graft.sources.v2

import scala.collection.concurrent.TrieMap

/** Write-side append rate limiting (the reference's per-journal
  * `max_append_rate`, protocol.proto:293-298, enforced by
  * broker/append_flow_control.go:59-220): a token bucket over appended
  * bytes, shared by every writer of a journal within this JVM.
  *
  * Placement note for cluster scale: the reference throttles at the
  * journal's PRIMARY BROKER — one process per journal. Spark has no
  * such single chokepoint on the write path (tasks spool in parallel),
  * so the bucket is per-executor-JVM and the DRIVER ships each JVM its
  * share of the aggregate ceiling ([[perJvmShare]]): configured rate ÷
  * executor JVMs at write-planning time, so the journal-wide aggregate
  * honors `maxAppendRate` without any cross-process coordination on
  * the hot path. In `local[*]` the JVM bucket IS the global bucket.
  *
  * The bucket holds up to one second of burst; it starts FULL so a
  * short append proceeds unthrottled (the reference likewise delays
  * only once the running rate exceeds the spec ceiling).
  */
object AppendFlowControl {

  final class TokenBucket(val bytesPerSec: Long) {
    require(bytesPerSec > 0, s"maxAppendRate must be positive, got $bytesPerSec")
    private val capacity: Double = bytesPerSec.toDouble
    private var tokens: Double = capacity
    private var lastNanos: Long = System.nanoTime()

    /** Block until `n` bytes of budget are available, then consume
      * them. Admission waits for `min(n, capacity)` tokens — a payload
      * larger than the whole bucket is admitted once the bucket is
      * FULL and carries the excess as negative balance (debt) the next
      * refill pays. Waiting for the full deficit AND booking the debt
      * would charge the excess twice, halving effective throughput for
      * oversized records.
      */
    def acquire(n: Long): Unit = {
      val need = n.toDouble
      val target = math.min(need, capacity)
      // Book under the lock, sleep outside it. The booking order IS the
      // admission order (virtual-time FIFO): each arrival's wait covers
      // the debt every earlier arrival already booked, so the sleep
      // never needs a re-check loop — which means no head-of-line
      // blocking (the lock is held for arithmetic only, never a sleep)
      // AND no starvation (a re-check loop would let a stream of small
      // appends consume every refill before an oversized waiter wakes;
      // here the oversized record's debt is booked first and later
      // arrivals queue behind it by construction).
      var waitNanos = 0L
      synchronized {
        val now = System.nanoTime()
        tokens = math.min(capacity,
          tokens + (now - lastNanos) * 1e-9 * bytesPerSec)
        lastNanos = now
        if (tokens < target)
          waitNanos = ((target - tokens) / bytesPerSec * 1e9).toLong
        // Full `need` booked, waited only to `target`: the excess of an
        // oversized record rides as debt that delays LATER arrivals —
        // waiting for the full deficit too would charge it twice.
        tokens -= need
      }
      if (waitNanos > 0L)
        Thread.sleep(waitNanos / 1000000L, (waitNanos % 1000000L).toInt)
    }
  }

  private val buckets = TrieMap.empty[(String, String, Long), TokenBucket]

  /** The JVM-wide bucket for (store root, journal, rate). The root is
    * part of the key because journal names are only unique within a
    * store — two same-named journals in different stores are distinct
    * journals and must not share a throttle. Keyed by rate too, so a
    * spec change to `maxAppendRate` takes effect on the next write
    * rather than silently keeping the old ceiling.
    */
  def bucket(root: String, journal: String, bytesPerSec: Long): TokenBucket =
    buckets.getOrElseUpdate((root, journal, bytesPerSec),
      new TokenBucket(bytesPerSec))

  /** Test hook: forget all buckets (fresh burst budget). */
  private[graft] def reset(): Unit = buckets.clear()

  /** Per-JVM share of a journal's AGGREGATE rate ceiling (round 9):
    * `maxAppendRate` is the journal's ceiling — the reference enforces
    * it at the one primary broker (broker/append_flow_control.go:
    * 59-220); Spark writes from parallel JVMs, so the DRIVER divides
    * the ceiling by the number of executor JVMs that can run write
    * tasks and ships the share into the task closure. In `local[*]`
    * the driver is the only executor (statusTracker reports just the
    * driver entry) and the share is the full rate.
    *
    * Contract: the aggregate never exceeds the configured ceiling for
    * the executor set present at write-planning time; executors that
    * join mid-write (dynamic allocation) add their own share until the
    * next write plans, and skewed task placement UNDER-uses budget (an
    * idle executor's share is not redistributed) — the honest costs of
    * throttling without the reference's single chokepoint. Callers
    * needing exact pacing under skew `coalesce(n)` and configure
    * `rate/n` explicitly, as before.
    */
  def perJvmShare(sc: org.apache.spark.SparkContext,
      bytesPerSec: Long): Long =
    if (bytesPerSec <= 0L) bytesPerSec
    else math.max(1L, bytesPerSec / executorJvms(sc))

  /** Executor-JVM count for the share computation. Static masters are
    * PARSED, not observed: executors register asynchronously, so a
    * write planned in the first seconds of a session would otherwise
    * see an empty registry, compute share = full rate, and ship every
    * late-registering executor a full-rate bucket — exceeding the
    * ceiling by the executor count exactly when the suite's first
    * journal write races session startup. Dynamic masters fall back to
    * max(registered now, spark.executor.instances) — the documented
    * planning-time semantics.
    */
  private[graft] def executorJvms(sc: org.apache.spark.SparkContext): Int = {
    val m = sc.master
    if (m.startsWith("local-cluster"))
      "local-cluster\\[\\s*(\\d+)".r.findFirstMatchIn(m)
        .map(_.group(1).toInt).filter(_ > 0).getOrElse(1)
    else if (m.startsWith("local")) 1
    else {
      // getExecutorInfos includes the driver entry; registered
      // executor JVMs = n - 1.
      val registered = sc.statusTracker.getExecutorInfos.length - 1
      val configured = sc.getConf
        .getOption("spark.executor.instances").map(_.toInt).getOrElse(0)
      math.max(1, math.max(registered, configured))
    }
  }
}
