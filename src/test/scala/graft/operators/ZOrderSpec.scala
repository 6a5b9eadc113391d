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
  }
}
