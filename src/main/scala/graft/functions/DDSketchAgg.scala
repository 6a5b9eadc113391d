package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** DDSketch-style mergeable quantile sketch (Masson, Rim & Lee,
  * "DDSketch: a fast and fully-mergeable quantile sketch with
  * relative-error guarantees", VLDB 2019): values bucket by
  * `ceil(log_γ(x))`, so every bucket spans a fixed RELATIVE range and
  * any quantile read from the bucket midpoint is within α of the true
  * value, where γ = (1+α)/(1-α).
  *
  * Scale rationale (SURVEY §2.11 Aggregator surface, with TopKAgg and
  * VecMean): the buffer is bucket→count maps — size O(log_γ(max/min)),
  * ~1k buckets at α=0.01 over 15 decades — and `merge` is pointwise
  * count addition, so the sketch combines map-side and only
  * buckets·partitions rows cross the shuffle regardless of input
  * size. Exact percentile_approx-style sorting is what this replaces:
  * a 100 TB quantile becomes a per-executor histogram + one tiny
  * merge, and sketches persisted per-partition/day can be re-merged
  * for any rollup later (fully mergeable, the property exact
  * quantiles lack).
  *
  * Determinism: the bucket index is a pure function of the value, the
  * merge is commutative integer addition, and quantile extraction
  * walks cumulative counts — no RNG, no order dependence, so a DuckDB
  * oracle replays the whole pipeline (same ln-ratio bucketing, same
  * cumulative walk, same midpoint formula).
  */
object DDSketchAgg {

  /** Negative values bucket on -x in `neg`, zeros count separately —
    * the three-store layout of the paper. Maps are bucket → count.
    */
  case class Sketch(neg: Map[Int, Long], zero: Long, pos: Map[Int, Long]) {
    def total: Long = neg.values.sum + zero + pos.values.sum
  }

  class DDSketch(gamma: Double) extends Aggregator[Double, Sketch, Sketch] {
    require(gamma > 1.0, s"gamma must be > 1, got $gamma")
    private val lnGamma = math.log(gamma)

    def index(x: Double): Int = {
      require(x > 0.0)
      math.ceil(math.log(x) / lnGamma).toInt
    }

    def zero: Sketch = Sketch(Map.empty, 0L, Map.empty)

    def reduce(b: Sketch, x: Double): Sketch =
      // Non-finite inputs are excluded: NaN fails both sign tests and
      // would silently count into the ZERO store (biasing every
      // quantile toward 0), and ±Infinity would bucket at Int.MaxValue.
      // Standard DDSketch implementations likewise reject non-finite.
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) b
      else if (x > 0.0) {
        val i = index(x)
        b.copy(pos = b.pos.updated(i, b.pos.getOrElse(i, 0L) + 1L))
      } else if (x < 0.0) {
        val i = index(-x)
        b.copy(neg = b.neg.updated(i, b.neg.getOrElse(i, 0L) + 1L))
      } else b.copy(zero = b.zero + 1L)

    // Buffer-design note: reduce allocates one Sketch + an O(log32 n)
    // HAMT path per row. A mutable-map buffer would avoid that churn,
    // but Aggregator buffers must round-trip bufferEncoder at every
    // partial/shuffle boundary — Encoders.product over immutable maps
    // is the supported, codegen'd path, and the sketch is bucket-count
    // bounded (≤ ~2·log_γ(max/min) entries), so the structural-sharing
    // copy stays shallow. Measured cost at the gate SF is noise
    // (q42/q113); revisit only if a profile shows reduce dominating.
    def merge(a: Sketch, b: Sketch): Sketch = Sketch(
      addMaps(a.neg, b.neg), a.zero + b.zero, addMaps(a.pos, b.pos))

    private def addMaps(x: Map[Int, Long], y: Map[Int, Long]) =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

    def finish(s: Sketch): Sketch = s

    def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Bucket midpoint: the value every member of bucket `i` rounds to,
    * within relative error α of any of them.
    */
  def estimate(gamma: Double, i: Int): Double =
    2.0 * math.pow(gamma, i) / (gamma + 1.0)

  /** Driver-side quantile read (for specs and sketch consumers):
    * rank = ceil(q·n) over the neg-desc → zero → pos-asc walk.
    */
  def quantile(gamma: Double, s: Sketch, q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val n = s.total
    require(n > 0, "empty sketch")
    // rank ≤ n always (ceil(q·n) ≤ n for q ≤ 1), so the three-store
    // walk is TOTAL: cum reaches n ≥ rank at the last bucket at the
    // latest. The fallback below is therefore reachable only under
    // floating-point pathology (ceil(q·n) > n needs n beyond 2^53);
    // it returns the LARGEST value the sketch holds — total for any
    // store shape, where a bare pos.keys.max would throw on an
    // all-negative or all-zero sketch.
    val rank = math.min(n, math.max(1L, math.ceil(q * n).toLong))
    var cum = 0L
    for ((i, c) <- s.neg.toSeq.sortBy(-_._1)) {
      cum += c
      if (cum >= rank) return -estimate(gamma, i)
    }
    cum += s.zero
    if (cum >= rank) return 0.0
    for ((i, c) <- s.pos.toSeq.sortBy(_._1)) {
      cum += c
      if (cum >= rank) return estimate(gamma, i)
    }
    if (s.pos.nonEmpty) estimate(gamma, s.pos.keys.max)
    else if (s.zero > 0) 0.0
    else -estimate(gamma, s.neg.keys.min)
  }

  /** Column-function form: `ddsketch(gamma)($"value")` → Sketch struct. */
  def ddsketch(gamma: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new DDSketch(gamma), Encoders.scalaDouble)
}
