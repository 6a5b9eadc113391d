package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Consumer-application surface (SURVEY §2.5 A1-A2).
  *
  * The reference's transaction loop — read/consume until stall, finalize,
  * commit checkpoint with state, acknowledge
  * (`/root/reference/consumer/transaction.go:22-90`) — IS Structured
  * Streaming's micro-batch cycle: trigger ≈ txn duration bounds, offset +
  * commit logs + state store ≈ the checkpoint, sink idempotence ≈ ACKs.
  * This wrapper therefore only binds the application callbacks
  * (`consumer/interfaces.go:232-303`) to `flatMapGroupsWithState`; there
  * is no custom loop to write.
  */
object ConsumerApp {

  /** Keyed stateful processing: per key, `consume` folds a batch of
    * messages into state and emits outputs. Works identically over batch
    * and streaming Datasets (Spark's unified API); in streaming, state
    * lives in the checkpointed state store (the recovery-log replacement,
    * SURVEY §2.6 ST5).
    */
  def keyedStateful[M, K: Encoder, S: Encoder, O: Encoder](
      msgs: Dataset[M], key: M => K, init: S)(
      consume: (K, Seq[M], S) => (S, Seq[O])): Dataset[O] = {

    val grouped = msgs.groupByKey(key)(implicitly[Encoder[K]])
    if (msgs.isStreaming) {
      grouped.flatMapGroupsWithState[S, O](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: K, it: Iterator[M], state: GroupState[S]) =>
          val s0 = state.getOption.getOrElse(init)
          val (s1, out) = consume(k, it.toSeq, s0)
          state.update(s1)
          out.iterator
      }
    } else {
      grouped.flatMapGroups { (k: K, it: Iterator[M]) =>
        consume(k, it.toSeq, init)._2.iterator
      }
    }
  }
}
