package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection — the token-window form of
  * exact-substring deduplication ("Deduplicating Training Data Makes
  * Language Models Better", Lee et al., 2022). Passage dedup
  * ([[Dedup.passageDedupStats]]) chops documents at fixed boundaries, so
  * a duplicated paragraph straddling a boundary is invisible; here every
  * stride-1 window of `width` tokens is hashed, windows occurring more
  * than once anywhere in the corpus are marked, and overlapping marked
  * windows are merged into maximal duplicated spans per document — the
  * per-doc report a span-removal pass would consume.
  *
  * Scale design (100 TB): the window stream is |tokens| rows (the same
  * input size a suffix-array build scans), but only fixed-width 32-byte
  * md5 keys and a position ever leave the executor — never window text.
  *   - duplicate marking: ONE hash-shuffle on the window hash
  *     (partial-agg count, then the position list rides with the hash);
  *   - span merge: ONE shuffle on doc_id, then a partition-local sort
  *     and two window passes (gaps-and-islands) — no driver collection,
  *     no per-doc loops;
  *   - docs with no duplicated window are restored by a left join from
  *     the per-doc token counts (broadcast-sized right side is NOT
  *     assumed: it is a doc_id-keyed shuffle join, matching the q22
  *     dedup family).
  *
  * Oracle parity: window hash = md5 of the space-joined token slice
  * (same convention as passage dedup / chunking), positions 0-based,
  * islands split where `pos > prev_pos + width` (strictly-after
  * adjacency: [i, i+w) ∪ [j, j+w) is contiguous iff j <= i+w). All
  * outputs are integer counts plus one final rounded division.
  */
object SpanDedup {

  /** Per-document duplicated-span stats: (doc_id, n_tokens, n_spans,
    * dup_tokens, dup_ratio). Documents shorter than `width` tokens (or
    * empty) report zero spans.
    */
  def spanStats(df: DataFrame, id: Column, text: Column,
      width: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val toks = TextAnalysis.wordTokens(text)
    // Consumed by two branches (window stream + the restore join) and
    // Spark has no cross-branch plan reuse: persist so the CPU-bound
    // regex tokenize runs once per document, not twice.
    val base = df.select(id.cast("long").as("doc_id"), toks.as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (doc_id, i, h) for every stride-1 window; fused into the scan
    // projection — the token array never shuffles.
    val wins = base.filter(col("n") >= width)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0L), col("n") - width),
        i => struct(i.as("i"),
          md5(array_join(slice(col("w"), (i + 1).cast("int"), lit(width)), " "))
            .as("h"))))
        .as("x"))
      .select(col("doc_id"), col("x.i").as("i"), col("x.h").as("h"))
    // Corpus-wide occurrence count per window hash (within-doc repeats
    // count: a doc that repeats its own paragraph is self-duplicated).
    val dupPos = wins
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("cnt") > 1)
      .select(col("doc_id"), col("i"))
    // Gaps-and-islands merge of the fixed-width intervals [i, i+width).
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val spans = dupPos
      .withColumn("brk",
        when(col("i") > lag(col("i"), 1).over(byDoc) + width, 1L)
          .when(lag(col("i"), 1).over(byDoc).isNull, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg((max(col("i")) + width - min(col("i"))).as("len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("dup_tokens"))
    base.select(col("doc_id"), col("n"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n") > 0,
          // floorRound6 (rule 9): plain round() splits Spark/DuckDB on
          // shortest-repr half-ulp boundaries of derived ratios — the
          // class that fired live at sf1 on q121/q127; every sibling
          // dedup ratio (passageDedupStats, ngramNovelty,
          // repetitionStats) already uses the floor-scaled form.
          Curation.floorRound6(
            coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n")))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }
}
