package graft.operators

import org.apache.spark.sql.SparkSession

/** Latency discipline for DRIVER-SYNCHRONIZED iterative loops whose
  * per-round REDUCE side is bounded by a model constant — k centroids,
  * a pair vocabulary, a 1-row argmax — rather than by corpus size.
  *
  * For such rounds the session defaults are pure overhead (measured on
  * the BPE trainer, PERF.md round-10): AQE materializes every shuffle
  * stage as its own job (~0.3 s fixed latency per round) and schedules
  * a full shuffle-partition fan of reduce tasks for a few KB of
  * aggregate state. Map-side partial aggregation already collapses to
  * the bounded vocabulary BEFORE the exchange, so pinning a small
  * reduce width and skipping AQE inside the loop changes nothing about
  * the corpus-sized map side — at any scale.
  *
  * NOT for loops whose per-round shuffle is corpus-sized (BFS
  * frontiers, label propagation, k-core peeling): those want AQE's
  * coalescing and skew handling, and their reduce width must scale
  * with the data. The discipline is applied per-operator, with the
  * boundedness argument stated at the call site.
  */
private[graft] object IterLoop {

  /** Run `body` with AQE off and `spark.sql.shuffle.partitions`
    * pinned to `reduceWidth`; always restores the session's previous
    * values. Single-session mutation — an UNRELATED query submitted on
    * the same session during `body` would observe the loop confs, the
    * standing caveat of any session-conf scope in Spark; a host
    * serving concurrent interactive work should give each stream its
    * own `spark.newSession()` (session-isolated SQLConf), which is the
    * isolation Spark itself provides for exactly this. What IS guarded
    * here: two tinyReduce scopes on the same session serialize on a
    * per-session monitor — interleaved save/restore would otherwise
    * capture the first loop's confs as the "previous" values and leave
    * AQE off on the session forever after both unwind.
    */
  def tinyReduce[A](spark: SparkSession, reduceWidth: Int = 8)(body: => A): A =
    scopeLock.computeIfAbsent(spark, _ => new Object).synchronized {
      val confs = Seq("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> reduceWidth.toString)
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

  // Weak keys: a stopped session's monitor must not pin the session.
  private val scopeLock: java.util.Map[SparkSession, Object] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Object]())
}
