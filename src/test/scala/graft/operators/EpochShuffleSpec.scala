package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EpochShuffleSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  test("positions are a dense 0..n_i-1 sequence per shard") {
    val out = EpochShuffle.order(docs(200), col("doc_id"), "ep7", 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 200)
    assert(out.map(_._3).toSet == (0L until 200L).toSet) // a permutation
    out.groupBy(_._1).foreach { case (_, rows) =>
      val pos = rows.map(_._2).sorted
      assert(pos.toSeq == (0L until rows.length.toLong).toSeq)
    }
  }

  test("order matches the window-rank oracle and is deterministic") {
    import spark.implicits._
    val d = docs(300)
    val out = EpochShuffle.order(d, col("doc_id"), "ep7", 4)
    // Reference: the one-window form (fine at test scale).
    val keyed = d.select(col("doc_id"),
      (conv(substring(md5(concat(lit("s:ep7:"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 4).cast("int").as("shard"),
      md5(concat(lit("o:ep7:"), col("doc_id").cast("string"))).as("okey"))
    val ref = keyed.select(col("shard"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("okey"))) - 1)
        .cast("long").as("pos"),
      col("doc_id"))
    assert(out.except(ref).isEmpty && ref.except(out).isEmpty)
    // Re-running yields the identical assignment (no RNG anywhere).
    val again = EpochShuffle.order(d, col("doc_id"), "ep7", 4)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("orderWithPriority streams priority classes in order within shards") {
    import spark.implicits._
    val d = docs(200).withColumn("p", (col("doc_id") % 3).cast("int"))
    val out = EpochShuffle.orderWithPriority(d, col("doc_id"), col("p"),
        "cur1", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.length == 200)
    // Walking each shard by position, priority never decreases.
    out.groupBy(_._1).foreach { case (_, rows) =>
      val pr = rows.sortBy(_._2).map(_._4)
      assert(pr.zip(pr.tail).forall { case (x, y) => x <= y })
    }
    // Priority equals the input column per doc.
    out.foreach { case (_, _, id, p) => assert(p == (id % 3).toInt) }
  }

  test("changing the seed re-deals the order") {
    val a = EpochShuffle.order(docs(300), col("doc_id"), "ep7", 4)
      .collect().map(r => (r.getLong(2), (r.getInt(0), r.getLong(1)))).toMap
    val b = EpochShuffle.order(docs(300), col("doc_id"), "ep8", 4)
      .collect().map(r => (r.getLong(2), (r.getInt(0), r.getLong(1)))).toMap
    assert(a.keySet == b.keySet)
    // Some documents must move (an identical deal would mean the seed
    // is ignored); with 300 docs the chance of a coincidental full
    // match is ~0.
    assert(a.exists { case (k, v) => b(k) != v })
  }

  test("batchMixAudit law: DF audit equals the pure mirror on random orders") {
    import spark.implicits._
    import graft.operators.EpochShuffle
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 6) {
      val nDocs = 5 + rnd.nextInt(60)
      val nSrc = 1 + rnd.nextInt(4)
      val b = 1 + rnd.nextInt(9)
      val docs = (0 until nDocs)
        .map(i => (i.toLong, f"s${rnd.nextInt(nSrc)}%02d"))
      val perm = rnd.shuffle(docs.map(_._1))
      val shards = 1 + rnd.nextInt(3)
      val order = perm.zipWithIndex
        .map { case (d, i) => ((d % shards).toInt, (i / shards).toLong, d) }
      val got = EpochShuffle.batchMixAudit(
          order.toDF("shard", "pos", "doc_id"),
          docs.toDF("doc_id", "source"), $"doc_id", $"source", b)
        .collect().map(r => (r.getInt(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))).toMap
      // Pure mirror of the integer TVD over the union of sources.
      val srcOf = docs.toMap
      val corpus = docs.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
      val n = nDocs.toLong
      val want = order.groupBy { case (sh, p, _) => (sh, p / b) }
        .map { case (key, rows) =>
          val cs = rows.groupBy(r => srcOf(r._3))
            .map { case (s, xs) => s -> xs.size.toLong }
          val nb = rows.size.toLong
          val devs = (cs.keySet ++ corpus.keySet).toSeq.sorted
            .map(s => s -> (n * cs.getOrElse(s, 0L) -
              nb * corpus.getOrElse(s, 0L)))
          val tvd = devs.map { case (_, d) => math.abs(d) }.sum
          // present sources only, (dev DESC, source ASC)
          val (ws, wd) = devs.filter(d => cs.contains(d._1))
            .minBy { case (s, d) => (-d, s) }
          key -> (nb, tvd, ws, wd)
        }
      assert(got == want, s"trial $trial (b=$b shards=$shards): $got vs $want")
    }
  }

  test("batchMixAudit: zero TVD on a perfect mix, max on a segregated order") {
    import spark.implicits._
    import graft.operators.EpochShuffle
    // 4 a-docs (ids 0-3), 4 b-docs (ids 4-7); batch = 4 docs, 1 shard.
    val docs = (0L to 7L).map(i => (i, if (i < 4) "a" else "b"))
      .toDF("doc_id", "source")
    def audit(order: Seq[Long]): Map[Long, (Long, Long, String, Long)] =
      EpochShuffle.batchMixAudit(
          order.zipWithIndex.map { case (d, p) => (0, p.toLong, d) }
            .toDF("shard", "pos", "doc_id"),
          docs, $"doc_id", $"source", batchSize = 4)
        .collect().map(r => r.getLong(1) ->
          (r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))).toMap
    // Alternating: every batch matches the corpus histogram exactly.
    val mixed = audit(Seq(0L, 4L, 1L, 5L, 2L, 6L, 3L, 7L))
    assert(mixed == Map(
      0L -> ((4L, 0L, "a", 0L)), 1L -> ((4L, 0L, "a", 0L))))
    // Segregated: batch 0 is all-a. tvd_num = |8·4 − 4·4| + 4·(8−4)
    // = 32 → TVD 32/(2·8·4) = 0.5, the distance from (1,0) to (½,½).
    val seg = audit(Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(seg == Map(
      0L -> ((4L, 32L, "a", 16L)), 1L -> ((4L, 32L, "b", 16L))))
  }
}
