package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking with overlap — the standard
  * RAG / context-window preprocessing step: split each document's
  * token stream into `width`-token chunks advancing by `stride`
  * (stride < width ⇒ overlapping chunks), keeping per-chunk
  * provenance (start offset, length) and a content hash for
  * downstream chunk-level dedup.
  *
  * Scale design: the whole operator is one narrow projection —
  * tokenize, compute the chunk-start sequence, explode, slice. No
  * shuffle, no state, embarrassingly parallel at any corpus size;
  * the only care needed is input splitability (repartition a
  * single-file parquet before this map, as the gate query does).
  *
  * Determinism: chunk count and offsets are integer arithmetic; the
  * chunk hash is md5 of the space-joined token slice — identical in
  * the DuckDB oracle.
  */
object Chunking {

  /** (doc_id, chunk_id, start_tok, n_toks, chunk_hash) per chunk.
    * Documents with zero tokens produce no chunks. The final chunk may
    * be shorter than `width`; a doc shorter than `width` yields
    * exactly one chunk.
    */
  def chunkTokens(docs: DataFrame, id: Column, text: Column,
                  width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width, got width=$width stride=$stride")
    val toks = docs.select(id.cast("long").as("doc_id"),
        TextAnalysis.wordTokens(text).as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .filter(col("n") > 0)
    // ceil((n - width)/stride) + 1 starts; the double division is exact
    // for any realistic token count (< 2^52).
    val nChunks = (floor((greatest(col("n") - width, lit(0L)) + (stride - 1))
      / lit(stride)) + 1).cast("int")
    toks
      .select(col("doc_id"), col("w"), col("n"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => (i * stride).cast("long"))).as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id"),
        col("start_tok"),
        least(lit(width.toLong), col("n") - col("start_tok")).as("n_toks"),
        md5(concat_ws(" ", slice(col("w"), (col("start_tok") + 1).cast("int"),
          least(lit(width.toLong), col("n") - col("start_tok")).cast("int"))))
          .as("chunk_hash"))
  }
}
