package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window preparation
  * step of a training/RAG pipeline: split each document into
  * fixed-token-budget chunks with a configurable overlap so no
  * boundary context is lost.
  *
  * Pure per-row HOF work in the scan stage (sequence → transform →
  * posexplode): zero shuffle, output linear in Σ chunks. The chunk
  * count and every boundary are integer arithmetic on the token
  * count — deterministic and engine-portable, so the whole operator
  * sits under the DuckDB oracle. Contrast [[Packing.packGreedy]],
  * which solves the inverse problem (many short docs → one fixed
  * budget); chunking cuts long docs DOWN to the budget.
  */
object Chunking {

  /** Whitespace tokens with original casing/punctuation preserved —
    * chunk text must reassemble the document's actual words, not the
    * lowercased [a-z0-9] normalization used for dedup fingerprints. */
  def whitespaceTokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** One row per (document, chunk): sliding windows of `chunkTokens`
    * whitespace tokens advancing by `chunkTokens - overlapTokens`.
    * The final chunk may be shorter; a document shorter than one
    * budget yields exactly one chunk. Chunks are joined back with a
    * single space (whitespace runs are not preserved — the operator's
    * contract is token-level, not byte-level).
    *
    * @return (idCol, chunk_id, n_tokens, chunk_text)
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlapTokens < chunkTokens")
    val stride = chunkTokens - overlapTokens
    val toks = whitespaceTokens(col(textCol))
    val n = size(toks)
    // 1 + ceil((n - chunk) / stride); exact — token counts are far
    // below 2^53, so the double division floors exactly
    val nChunks = when(n <= chunkTokens, lit(1))
      .otherwise(lit(1) +
        floor((n - chunkTokens + stride - 1) / lit(stride)).cast("int"))
    docs.select(
      col(idCol),
      toks.as("_toks"),
      sequence(lit(0), nChunks - 1).as("_idx"))
      .select(col(idCol),
        posexplode(transform(col("_idx"), i =>
          array_join(slice(col("_toks"), i * stride + 1, lit(chunkTokens)), " ")))
          .as(Seq("chunk_id", "chunk_text")),
        col("_toks"))
      .select(col(idCol), col("chunk_id"),
        size(slice(col("_toks"), col("chunk_id") * stride + 1, lit(chunkTokens)))
          .as("n_tokens"),
        col("chunk_text"))
  }
}
