package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the rsync/FastCDC idea at token
  * granularity): a chunk boundary falls AFTER every token whose hash
  * lands in a fixed residue class, so boundaries are decided by
  * content, not position. Insert or delete a token and only the
  * chunk containing the edit (and at most its neighbor) changes its
  * hash — every later chunk re-aligns, which is what makes CDC the
  * chunking layer for dedup stores and incremental corpus syncs.
  * [[Chunking.chunkTokens]] (fixed stride) has the opposite property:
  * one leading edit shifts every downstream chunk hash.
  *
  * divisor = 16 → expected chunk length 16 tokens (geometric), no
  * minimum/maximum cap (caps would need the FastCDC gear rules; the
  * plain residue rule keeps the oracle a pure list expression).
  *
  * Scale design: boundaries, chunk spans, and chunk hashes are all
  * computed inside ONE narrow projection over the token array — no
  * shuffle at any scale, embarrassingly parallel over documents.
  * Determinism: the cut decision is md5-prefix % divisor == 0, the
  * chunk hash is md5 of the space-joined slice — both replayable in
  * ANSI SQL.
  */
object CdcChunking {

  /** Per-chunk rows (doc_id, chunk_id, start_tok 0-based, n_toks,
    * chunk_hash). Documents with zero tokens emit no chunks.
    */
  def chunk(df: DataFrame, id: Column, text: Column,
      divisor: Int = 16): DataFrame = {
    require(divisor > 0, s"divisor must be positive, got $divisor")
    val toks = TextAnalysis.wordTokens(text)
    def isCut(tok: Column): Column =
      conv(substring(md5(tok.cast("binary")), 1, 8), 16, 10)
        .cast("long") % divisor === 0
    val base = df.select(id.cast("long").as("doc_id"), toks.as("w"))
      .filter(size(col("w")) > 0)
      .withColumn("n", size(col("w")))
    // chunk END positions (1-based): every cut token before the last
    // position, plus the document end.
    val withEnds = base.withColumn("ends",
      concat(
        filter(sequence(lit(1), col("n")),
          i => isCut(element_at(col("w"), i)) && i < col("n")),
        array(col("n"))))
    withEnds.select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ends"))),
        j => {
          val start = when(j === 1, lit(1))
            .otherwise(element_at(col("ends"), (j - 1).cast("int")) + 1)
          val end = element_at(col("ends"), j.cast("int"))
          struct((j - 1).cast("int").as("chunk_id"),
            (start - 1).cast("long").as("start_tok"),
            (end - start + 1).cast("long").as("n_toks"),
            md5(array_join(
              slice(col("w"), start, end - start + 1), " ")).as("chunk_hash"))
        })).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.start_tok"),
        col("c.n_toks"), col("c.chunk_hash"))
  }
}
