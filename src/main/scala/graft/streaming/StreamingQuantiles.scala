package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.DDSketchAgg
import graft.functions.DDSketchAgg.Sketch

/** Streaming quantile maintenance — the incremental form of the batch
  * DDSketch aggregate (`functions.DDSketchAgg`, gate q113): per-key
  * sketches live in keyed state, every micro-batch folds its values
  * in, and the updated keys re-emit current p50/p90/p99 estimates.
  * The latency-percentile monitor pattern: exact-sort quantiles need
  * the full history; this keeps O(log_γ range) bucket counts per key
  * — bounded state however long the stream runs — while inheriting
  * the sketch's α relative-error guarantee at every point in the
  * stream.
  *
  * State scales out with shuffle partitions (keyed state), checkpoints
  * and recovers like any stateful query, and — because the sketch
  * merge is commutative addition — a recovered or re-sharded stream
  * converges to the same sketch as an uninterrupted one.
  */
object StreamingQuantiles {

  case class Estimate(key: String, n: Long,
                      p50: Double, p90: Double, p99: Double)

  /** (key, value) stream → per-batch updated quantile estimates.
    * Output mode Update: a key re-emits only when its sketch changed.
    */
  def quantiles(rows: Dataset[(String, Double)],
                gamma: Double): Dataset[Estimate] = {
    import rows.sparkSession.implicits._
    val agg = new DDSketchAgg.DDSketch(gamma)
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[Sketch, Estimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, vs, state: GroupState[Sketch]) =>
          val st0 = state.getOption.getOrElse(agg.zero)
          val st1 = vs.foldLeft(st0)((s, kv) => agg.reduce(s, kv._2))
          state.update(st1)
          Iterator.single(Estimate(key, st1.total,
            DDSketchAgg.quantile(gamma, st1, 0.50),
            DDSketchAgg.quantile(gamma, st1, 0.90),
            DDSketchAgg.quantile(gamma, st1, 0.99)))
      }
  }
}
