package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters with bounded state — the incremental form
  * of the batch two-pass operator (`operators.HeavyHitters`).
  *
  * State is sharded by token-hash slot: every occurrence of a token
  * lands in the same slot, so a token with global frequency > N/k has
  * slot frequency > n_slot/k and is GUARANTEED to survive its slot's
  * k-1-counter Misra-Gries summary — the union of slot summaries is a
  * candidate superset at every point in the stream, with
  * O(slots·k) total state regardless of vocabulary size. Slots are
  * keyed state, so the operator scales out with shuffle partitions and
  * recovers from checkpoints like any stateful query.
  *
  * Each micro-batch emits the updated slots' summaries
  * (slot, token, est, slot_total); `est` underestimates the true count
  * by at most n_slot/k (the classic MG bound).
  */
object StreamingHeavyHitters {

  case class SlotState(counts: Map[String, Long], total: Long)
  case class Candidate(slot: Int, token: String, est: Long, slot_total: Long)

  /** Apply MG(k) increments of `toks` to `st`. */
  private[graft] def advance(st: SlotState, toks: Iterator[String], k: Int): SlotState = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    m ++= st.counts
    var total = st.total
    toks.foreach { w =>
      total += 1
      m.get(w) match {
        case Some(c) => m(w) = c + 1
        case None if m.size < k - 1 => m(w) = 1L
        case None =>
          val dead = m.iterator.filter(_._2 == 1L).map(_._1).toList
          for ((key, c) <- m) m(key) = c - 1
          dead.foreach(m.remove)
      }
    }
    SlotState(m.toMap, total)
  }

  /** tokens (streaming Dataset[String]) → per-batch updated slot
    * summaries. Output mode: Update (re-emits a slot's summary when it
    * changes).
    */
  def candidates(tokens: Dataset[String], k: Int, slots: Int): Dataset[Candidate] = {
    // Validate at the driver: slots <= 0 would throw ArithmeticException
    // per record inside executor tasks, and k <= 1 makes the MG summary
    // track nothing and silently emit zero candidates forever.
    require(slots >= 1, s"slots must be >= 1, got $slots")
    require(k >= 2, s"k must be >= 2 (a k-1 entry summary), got $k")
    import tokens.sparkSession.implicits._
    tokens
      .groupByKey(t => math.floorMod(t.hashCode, slots))
      .flatMapGroupsWithState[SlotState, Candidate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (slot, toks, state: GroupState[SlotState]) =>
          val st0 = state.getOption.getOrElse(SlotState(Map.empty, 0L))
          val st1 = advance(st0, toks, k)
          state.update(st1)
          st1.counts.iterator.map { case (t, c) =>
            Candidate(slot, t, c, st1.total)
          }
      }
  }
}
