package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout (q70): interleave correctness and the locality the
  * layout buys (small per-partition bounding boxes in BOTH dims).
  */
class ZOrderSpec extends SparkSpec {

  test("bit interleave matches a reference implementation") {
    import spark.implicits._
    def morton(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits) {
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
      }
      z
    }
    // Ranges chosen so rank == raw value (identity quantization).
    val n = 1 << 8
    val df = (0 until n).flatMap(x => Seq((x.toLong, (x * 37 % n).toLong)))
      .toDF("x", "y")
    val got = ZOrder.withZValue(df, Seq(("x", 0L, n - 1L), ("y", 0L, n - 1L)), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (((x, y), z) <- got) assert(z == morton(x, y, 8), s"($x,$y)")
  }

  test("z-layout partitions have small bounding boxes in both dims") {
    import spark.implicits._
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dims = Seq(("x", 0L, n - 1L), ("y", 0L, n - 1L))
    val parts = 16

    // A 4×64 slab and a 16×16 z-box have the SAME area; what pruning
    // cares about is the extent per dimension — a predicate on y alone
    // skips a partition iff the partition's y-extent misses it. Compare
    // the average of the larger extent (worst queried dimension).
    def avgMaxExtent(df: org.apache.spark.sql.DataFrame): Double = {
      val boxes = df.withColumn("pid", spark_partition_id())
        .groupBy($"pid")
        .agg((max($"x") - min($"x") + 1).as("w"), (max($"y") - min($"y") + 1).as("h"))
        .select(greatest($"w", $"h").cast("double").as("e")).collect().map(_.getDouble(0))
      boxes.sum / boxes.length
    }
    val zExt = avgMaxExtent(ZOrder.layoutByZ(grid, dims, 6, parts))
    // Single-key range layout: each slab spans the FULL y range (64).
    val slabExt = avgMaxExtent(grid.repartitionByRange(parts, $"x"))
    assert(zExt < slabExt / 2,
      s"z-order avg max-extent $zExt not smaller than single-key slabs $slabExt")
    // Perfect squareness at 16 partitions of 64x64 = 16x16 boxes;
    // allow 2x slack for uneven range splits.
    assert(zExt <= 32, s"z boxes too loose: $zExt")
  }

  test("degenerate range is rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ZOrder.withZValue(df, Seq(("x", 5L, 5L), ("y", 0L, 1L)), 4)
    }
    intercept[IllegalArgumentException] {
      ZOrder.withHilbertValue(df, Seq(("x", 0L, 1L)), 4)
    }
  }

  test("hilbert index is a bijection whose consecutive cells are grid neighbors") {
    import spark.implicits._
    // First-order curve: (0,0) (0,1) (1,1) (1,0).
    assert(graft.functions.Curves.hilbert2(0, 0, 1) == 0L)
    assert(graft.functions.Curves.hilbert2(0, 1, 1) == 1L)
    assert(graft.functions.Curves.hilbert2(1, 1, 1) == 2L)
    assert(graft.functions.Curves.hilbert2(1, 0, 1) == 3L)

    val bits = 3
    val n = 1 << bits
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d = ZOrder
      .withHilbertValue(grid, Seq(("x", 0L, n - 1L), ("y", 0L, n - 1L)), bits)
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    // Bijection onto [0, 4^bits) ...
    assert(d.keySet == (0L until (n.toLong * n)).toSet)
    // ... and THE Hilbert property Morton lacks: every step of the
    // walk moves to a Manhattan-distance-1 neighbor (no jumps).
    for (i <- 0L until (n.toLong * n - 1)) {
      val (x0, y0) = d(i); val (x1, y1) = d(i + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump at d=$i: ($x0,$y0) -> ($x1,$y1)")
    }
    // The codegen expression agrees with the kernel on random ranks.
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
      .toDF("x", "y")
    val viaExpr = pts.select($"x", $"y",
        graft.functions.F.hilbert2($"x", $"y", 16).as("h"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getLong(2) ==
        graft.functions.Curves.hilbert2(r.getLong(0), r.getLong(1), 16))
    }
  }

  test("hilbert layout beats morton on average partition extent") {
    import spark.implicits._
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dims = Seq(("x", 0L, n - 1L), ("y", 0L, n - 1L))
    val parts = 16
    def avgMaxExtent(df: org.apache.spark.sql.DataFrame): Double = {
      val boxes = df.withColumn("pid", spark_partition_id())
        .groupBy($"pid")
        .agg((max($"x") - min($"x") + 1).as("w"), (max($"y") - min($"y") + 1).as("h"))
        .select(greatest($"w", $"h").cast("double").as("e")).collect().map(_.getDouble(0))
      boxes.sum / boxes.length
    }
    val h = avgMaxExtent(ZOrder.layoutByHilbert(grid, dims, 6, parts))
    val z = avgMaxExtent(ZOrder.layoutByZ(grid, dims, 6, parts))
    // Both cluster well; Hilbert's continuity can only tighten boxes.
    assert(h <= z + 1e-9, s"hilbert extent $h worse than morton $z")
    assert(h <= 32, s"hilbert boxes too loose: $h")
  }
}
