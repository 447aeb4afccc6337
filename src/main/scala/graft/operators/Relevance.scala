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
}
