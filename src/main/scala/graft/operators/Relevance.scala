package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Sketches, TextFunctions}

/** Corpus-relative term relevance scoring — the TF-IDF family a
  * training-data pipeline uses for keyword extraction, topic tagging
  * and quality heuristics over the document corpus.
  *
  * Plan shape at scale: term frequencies are computed INSIDE each row
  * by the codegen'd TokenCounts expression (grouping by document is
  * free within the row), so the exploded (doc, term, tf) stream is
  * already aggregated — the corpus-wide (doc, term) shuffle a
  * groupBy-after-explode plan pays never happens. Document
  * frequencies are a small term-keyed aggregate over that stream, and
  * the corpus size joins in as a broadcast single-row aggregate — no
  * driver action, no collect. The final per-document top-k window partitions
  * by document, so each window partition is bounded by document
  * length (thousands of terms), never corpus-sized: row_number here
  * is scale-safe, unlike a per-query corpus ranking (see TopK for
  * that case).
  *
  * Determinism: the rank orders on the ROUNDED score with the term
  * string as tiebreak, so top-k membership is engine-independent
  * (the engine and the DuckDB oracle agree on round(tf·ln(...), 6)).
  */
object Relevance {

  /** Top-k TF-IDF terms per document.
    *
    * Score = tf · ln((N + 1) / (df + 1)) — the +1-smoothed IDF, so a
    * term present in every document scores ~0 instead of -∞ and the
    * log argument is always > 0.
    *
    * @return (doc_id, term, tf, df, score) — k rows per document that
    *         has at least one token
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
      explode(Sketches.token_counts(TextFunctions.tokens(col(textCol))))
        .as(Seq("term", "tf")))
    // tf is already distinct on (doc, term) — df is a plain count
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "tf", "df", "score")
  }

  /** Corpus vocabulary coverage — the tokenizer-prep probe: build the
    * top-`vocabSize` vocabulary by corpus token frequency
    * (count-desc, token-asc tiebreak — deterministic membership) and
    * score every document's out-of-vocabulary token ratio. High-OOV
    * documents are what a fixed-vocab tokenizer shreds into bytes;
    * this is the standard pre-training screen for them.
    *
    * Scale shape: per-row TokenCounts keeps the (doc, token, tf)
    * stream pre-aggregated exactly like [[tfidfTopTerms]]; the
    * vocabulary is a token-keyed aggregate cut by a bounded
    * TakeOrdered (vocabSize rows, never a global sort) and joins back
    * as a BROADCAST — the corpus never shuffles for the lookup.
    * Zero-token documents surface with n_tokens 0 / oov_ratio 0,
    * never dropped.
    *
    * @return (idCol, n_tokens, oov_ratio) — one row per input doc
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int, roundTo: Int = 4): DataFrame = {
    val tf = docs.select(col(idCol),
      explode(Sketches.token_counts(TextFunctions.tokens(col(textCol))))
        .as(Seq("tok", "tf")))
    val vocab = tf.groupBy(col("tok"))
      .agg(sum(col("tf")).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(vocabSize)
      .select(col("tok"), lit(true).as("_in_vocab"))
    val perDoc = tf.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        round(sum(when(col("_in_vocab").isNull, col("tf")).otherwise(lit(0L)))
          .cast("double") / sum(col("tf")), roundTo).as("oov_ratio"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("oov_ratio"), lit(0.0)).as("oov_ratio"))
  }
}
