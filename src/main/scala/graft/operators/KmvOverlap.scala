package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** Cross-source n-gram containment via KMV (k-minimum-values) sketches
  * — the mergeable-sketch counterpart of the exact LSH duplication
  * matrix (q131): per source keep the k smallest hash values of its
  * distinct shingle set; any two sketches then estimate union
  * cardinality ((k-1)/u_k over the merged k-min set, Beyer et al.
  * 2007), matching-fraction Jaccard, and so intersection size —
  * without touching the corpus again. The audit a mixing pipeline
  * runs continuously: sketches persist per source per day and MERGE
  * (k-min of k-mins), so "how much does feed A overlap feed B this
  * month" is sketch algebra, not a corpus scan.
  *
  * Scale shape: one fused tokenize→shingle map (narrow), ONE
  * (source, shingle)-distinct shuffle, then the k-bounded [[TopKAgg]]
  * per source — map-side combined, k rows per (partition, source)
  * cross the wire, S sketch rows total. Pair math runs on the S-row
  * sketch table (broadcast self-join, array expressions). The exact
  * intersection audit column is a shingle-keyed equi-join whose group
  * sizes are bounded by the source count — also scale-safe, which is
  * what lets the gate hash-check the estimator against truth.
  *
  * Determinism: hashes are md5-derived (u = first 8 hex / 2^32, 64-bit
  * tie word from the next 8 hex); hash values are deduped per source
  * BEFORE ranking so u-collisions cannot double-count on either
  * engine; all estimate arithmetic forms in a fixed op order and
  * rounds before comparison.
  */
object KmvOverlap {

  /** Pairwise source overlap estimates: (src_a, src_b, m, ku,
    * union_est, inter_est, exact_inter) for every unordered source
    * pair. `m` = matching hashes within the merged k-min set, `ku` =
    * its size (= k once both sketches saturate).
    */
  def sourceOverlap(docs: DataFrame, source: Column, text: Column,
      n: Int = 3, k: Int = 128): DataFrame = {
    require(n >= 1 && k >= 2, s"need n >= 1, k >= 2; got n=$n k=$k")
    val spark = docs.sparkSession
    import spark.implicits._

    // Fused tokenize → shingle strings, per-doc distinct (one narrow map).
    val shd = docs
      .select(source.cast("string").as("src"), text.cast("string").as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(String, String)]
      .flatMap { case (src, t) =>
        // The shared shingle machinery (TextAnalysis.ngramIterator over
        // the house tokenizer); per-doc dedupe before the global
        // distinct keeps the flatMap output bounded by content.
        val seen = new java.util.LinkedHashSet[String]()
        TextAnalysis.ngramIterator(t, n).foreach(seen.add)
        import scala.jdk.CollectionConverters._
        seen.asScala.iterator.map(s => (src, s))
      }.toDF("src", "s")
      .distinct() // corpus-wide (source, shingle) set — the one big shuffle
      // Persisted: consumed by the sketch branch AND both sides of the
      // exact-intersection self-join, and cross-branch plan reuse does
      // NOT exist in Spark — without this the tokenize+shingle+distinct
      // pipeline (the expensive stage) runs three times. Same doctrine
      // as Dedup.minhashLshPairs; released by the harness cache clear.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hashed = shd.select($"src",
        (conv(substring(md5($"s"), 1, 8), 16, 10).cast("long")
          / lit(4294967296.0)).as("u"),
        conv(substring(md5($"s"), 9, 8), 16, 10).cast("long").as("h2"))
      // Dedupe hash collisions within a source before ranking so a u
      // value can appear at most once per sketch (both engines agree).
      .groupBy($"src", $"u").agg(min($"h2").as("h2"))
    val topk = TopKAgg.topK(k)
    val sketches = hashed.groupBy($"src")
      .agg(topk(-$"u", $"h2").as("sk"))
      .select($"src", transform($"sk", e => -e.getField("v")).as("us"))
    val a = sketches.select($"src".as("src_a"), $"us".as("ua"))
    val b = sketches.select($"src".as("src_b"), $"us".as("ub"))
    val est = a.join(broadcast(b), $"src_a" < $"src_b")
      .withColumn("merged", array_sort(array_distinct(concat($"ua", $"ub"))))
      .withColumn("uk", slice($"merged", 1, k))
      .withColumn("ku", size($"uk").cast("long"))
      .withColumn("ukmax", element_at($"uk", size($"uk")))
      .withColumn("m",
        size(array_intersect(array_intersect($"uk", $"ua"), $"ub"))
          .cast("long"))
      .withColumn("union_est",
        when($"ku" >= k, graft.operators.Curation.floorRound(lit((k - 1).toDouble) / $"ukmax", 2))
          .otherwise($"ku".cast("double")))
      .withColumn("inter_est", graft.operators.Curation.floorRound($"m" / $"ku" * $"union_est", 2))
    val exact = shd.as("x")
      .join(shd.as("y"), col("x.s") === col("y.s") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("src_a"), col("y.src").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    est.join(exact, Seq("src_a", "src_b"), "left")
      .select($"src_a", $"src_b", $"m", $"ku", $"union_est", $"inter_est",
        coalesce($"exact_inter", lit(0L)).as("exact_inter"))
  }
}
