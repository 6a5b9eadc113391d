package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (100 TB):
  *  - exact dedup is a single hash-shuffle on the fingerprint; Spark's
  *    partial aggregation dedups within partitions before the shuffle.
  *  - MinHash+LSH is the scale path for near-dup detection: cost is
  *    O(docs · shingles) for signatures plus a shuffle on (band, bucket)
  *    whose groups are tiny, then exact verification only on candidate
  *    pairs (joined back to shingle arrays).
  *  - the exhaustive shingle self-join (`jaccardPairsExact`) is the
  *    correctness baseline; its `maxShingleFreq` knob drops stop-shingles
  *    that would otherwise quadratically explode the join at scale.
  */
object Dedup {

  /** Exact dedup: keep the first row per key in `orders` order. */
  def exactDedup(df: DataFrame, keys: Seq[Column], orders: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(orders.map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** (id, shingles[]) per document. */
  def docShingles(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("doc_id"), TextAnalysis.shingles(text, n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exhaustive near-duplicate pairs with exact n-gram Jaccard >= threshold.
    * Shuffles: explode→join on shingle, then one aggregation. At scale,
    * set `maxShingleFreq` to drop ubiquitous shingles from candidate
    * generation (note: affects recall only for pairs whose every shared
    * shingle is ubiquitous).
    */
  def jaccardPairsExact(
      docs: DataFrame, // (doc_id, sh)
      threshold: Double,
      maxShingleFreq: Option[Int] = None): DataFrame = {
    val ex0 = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val ex = maxShingleFreq match {
      case Some(f) =>
        import org.apache.spark.sql.expressions.Window
        ex0.withColumn("__f", count(lit(1)).over(
          Window.partitionBy(col("shingle")))).filter(col("__f") <= f).drop("__f")
      case None => ex0
    }
    val cnt = docs.select(col("doc_id"), size(col("sh")).as("c"))
    val shared = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(cnt.as("ca"), col("da") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("db") === col("cb.doc_id"))
      .select(col("da"), col("db"),
        (col("shared").cast("double") /
          (col("ca.c") + col("cb.c") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: `numHashes` permutations approximated by
    * xxhash64 with distinct salts; signature_i = min over shingles.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    ex.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: band the signature, bucket-join within bands,
    * then verify candidates with exact Jaccard over the shingle arrays.
    * With bands·rows = numHashes, P[candidate] = 1-(1-j^rows)^bands —
    * 12 bands × 4 rows gives >0.999996 recall at j=0.9.
    */
  def minhashLshPairs(
      docs: DataFrame, // (doc_id, sh)
      threshold: Double,
      numHashes: Int = 48,
      bands: Int = 12): DataFrame = {
    val rows = numHashes / bands
    val sig = minhashSignatures(docs, numHashes)
    // (band, bucketHash, doc_id)
    val buckets = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"h$i"))
      sig.select(lit(b).as("band"),
        xxhash64(cols: _*).as("bucket"), col("doc_id"))
    }.reduce(_.unionAll(_))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    // Exact verification on candidates only.
    cand
      .join(docs.select(col("doc_id"), col("sh").as("sha")), col("da") === col("doc_id")).drop("doc_id")
      .join(docs.select(col("doc_id"), col("sh").as("shb")), col("db") === col("doc_id")).drop("doc_id")
      .select(col("da"), col("db"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over word tokens: bit b of the hash is the sign of
    * Σ_tokens (±1 per token's xxhash64 bit b). Near-dups have small
    * Hamming distance. One narrow map + no shuffle per document.
    */
  def simhash64(tokens: Column): Column = {
    val h = transform(tokens, t => xxhash64(t))
    val bitSums = (0 until 64).map { b =>
      aggregate(h, lit(0L),
        (acc, x) => acc + when(shiftright(x, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.map { case (s, b) =>
      when(s > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }
}
