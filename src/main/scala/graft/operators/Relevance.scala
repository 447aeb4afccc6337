package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** BM25 retrieval scoring against a FIXED query-term list — the
    * ranking function actual search/retrieval-augmentation pipelines
    * run over a corpus (Robertson-Spärck Jones, the k1/b form):
    *
    *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
    *                         (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))   (always ≥ 0)
    *
    * Because the query list is literal, term frequencies come from
    * per-row map lookups on the codegen'd TokenCounts expression and
    * the per-term scores SUM IN LIST ORDER as plain column addition —
    * no explode, no per-term shuffle, and (crucially for the oracle)
    * no aggregation-order float drift: an independent engine summing
    * the same literal order reproduces the double bit-for-bit. The
    * corpus statistics (N, avgdl, per-term df) ride in as ONE
    * broadcast scalar row.
    *
    * @return (idCol, n_matched, score) for documents matching ≥ 1
    *         query term, the top `k` by (score desc, id asc) on the
    *         ROUNDED score — engine-independent membership
    */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int = 50,
                  k1: Double = 1.2, b: Double = 0.75,
                  roundTo: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct.size == queryTerms.size,
      "query terms must be non-empty and distinct")
    val base = docs.select(col(idCol),
      Sketches.token_counts(TextFunctions.tokens(col(textCol))).as("_tc"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("_dl"))
    def tf(t: String): Column = coalesce(element_at(col("_tc"), t), lit(0L))
    val aggCols = count(lit(1)).cast("double").as("n") +:
      sum(col("_dl")).cast("double").as("sumdl") +:
      queryTerms.map(t =>
        sum(when(tf(t) > 0, 1L).otherwise(0L)).cast("double").as(s"df_$t"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val withStats = base.crossJoin(broadcast(stats))
    val avgdl = col("sumdl") / col("n")
    val perTerm = queryTerms.map { t =>
      val idf = log(lit(1.0) +
        (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      val denom = tf(t).cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl").cast("double") / avgdl)
      idf * (tf(t).cast("double") * lit(k1 + 1.0)) / denom
    }
    val nMatched = queryTerms.map(t => when(tf(t) > 0, 1).otherwise(0))
      .reduce(_ + _)
    withStats
      .select(col(idCol), nMatched.as("n_matched"),
        round(perTerm.reduce(_ + _), roundTo).as("score"))
      .filter(col("n_matched") > 0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
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

  /** Bigram language-model fluency scoring — the KenLM-shaped quality
    * screen: train add-α-smoothed bigram statistics on a reference
    * corpus, score every candidate document by its mean token-level
    * log-probability. Gibberish, boilerplate and wrong-language text
    * score far below corpus-typical prose, which is why an n-gram LM
    * trained on a trusted corpus is the classic cheap perplexity
    * filter (CCNet / Gopher style) before any neural scoring.
    *
    *   P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V)
    *
    * with c(w₁·) the count of bigrams whose HISTORY is w₁ and V the
    * training vocabulary size — so unseen bigrams back off to
    * α/(c(w₁·)+αV), never to zero, and rows never hit ln(0).
    *
    * Scale shape: bigrams come from the codegen'd WordNgrams pass
    * (never a lambda re-tokenizing per gram); the model is two
    * token-keyed count aggregates (map-side partial) and V one scalar
    * that rides in as a broadcast single-row aggregate. Scoring
    * shuffles the candidate bigram stream twice (once keyed by bigram,
    * once by history) — both joins are key-to-key equi joins that AQE
    * can skew-split; at 100 TB the model tables are the small-but-not-
    * broadcastable side and the stream never materializes per-doc
    * state outside the final per-doc average. Swap the string keys for
    * xxhash64 fingerprints at extreme scale — same plan, 8-byte keys.
    *
    * Documents with fewer than two tokens have no bigrams: they
    * surface with n_bigrams = 0 and a NULL score (unknowable, not
    * perfect — a 0.0 would rank them above real prose).
    *
    * @return (idCol, n_bigrams, avg_logprob) — one row per `score` doc
    */
  def bigramLmScore(train: DataFrame, score: DataFrame,
                    idCol: String, textCol: String,
                    alpha: Double = 0.1, roundTo: Int = 6): DataFrame = {
    require(alpha > 0, s"alpha must be > 0 (zero re-opens ln(0)): $alpha")
    def bigrams(df: DataFrame, cols: Column*) = df.select(
      cols :+ explode(Sketches.word_ngrams(TextFunctions.tokens(col(textCol)),
        2, dedup = false, emptyIfShort = true)).as("bigram"): _*)
    val trainBi = bigrams(train)
    val c2 = trainBi.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    // history = first token of the bigram (tokens never contain spaces)
    val c1 = trainBi
      .select(substring_index(col("bigram"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = train
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val scored = bigrams(score, col(idCol))
      .join(c2, Seq("bigram"), "left")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("c2"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))).as("lp"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), roundTo).as("avg_logprob"))
    score.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"))
  }

  /** The composite pre-training quality filter (CCNet/Gopher shape):
    * every document gets its five screening signals, a keep/drop
    * verdict, and the NAMED list of failed checks — because a filter
    * that only says "dropped" is undebuggable at corpus scale; the
    * per-reason counts are what a curation run actually reports.
    *
    * Checks, in fixed report order:
    *  - `length`:     minTokens ≤ n_tokens ≤ maxTokens
    *  - `alpha`:      alphaRatio ≥ minAlpha (markup/number soup)
    *  - `repetition`: topFrequencyFraction over bigrams ≤
    *                  maxTopBigramFrac (the Gopher "top 2-gram"
    *                  signal — loops, spam, boilerplate stutter).
    *                  Token-level (n−distinct)/n is NOT used: natural
    *                  prose crosses any fixed distinct-ratio floor as
    *                  docs grow, so it only measures length. Docs
    *                  under the length floor get no repetition
    *                  verdict (one bigram is "100% repeated" only
    *                  vacuously; `length` already names them).
    *  - `lang`:       englishScore ≥ minEnScore (marker-ratio langID)
    *  - `lm`:         bigram-LM avg_logprob ≥ minAvgLogprob, trained
    *                  on `train` ([[bigramLmScore]]); a doc too short
    *                  to have bigrams FAILS this check (unknowable
    *                  fluency must not pass a fluency screen)
    *
    * All thresholds compare against the ROUNDED emitted signals, so
    * the verdicts are engine-portable exactly like the signals.
    * Scale shape: four of five signals are per-row codegen'd
    * expressions; the LM join is [[bigramLmScore]]'s two keyed
    * aggregates — nothing else shuffles.
    *
    * @return (idCol, n_tokens, alpha_ratio, top_bigram_frac, en_score,
    *         avg_logprob, keep, reasons) — one row per doc; `reasons`
    *         is the comma-joined failed-check names, '' when kept
    */
  def qualityFilter(docs: DataFrame, train: DataFrame,
                    idCol: String, textCol: String,
                    minTokens: Long = 25, maxTokens: Long = 100000,
                    minAlpha: Double = 0.6, maxTopBigramFrac: Double = 0.2,
                    minEnScore: Double = 0.05, minAvgLogprob: Double = -7.0,
                    lmAlpha: Double = 0.1): DataFrame = {
    val lm = bigramLmScore(train, docs, idCol, textCol, lmAlpha)
      .select(col(idCol), col("avg_logprob"))
    val t = coalesce(col(textCol), lit(""))
    val base = docs.select(col(idCol), t.as("_t"))
      .select(col(idCol),
        TextFunctions.tokenCount(col("_t")).cast("long").as("n_tokens"),
        round(TextFunctions.alphaRatio(col("_t")), 4).as("alpha_ratio"),
        round(TextFunctions.topFrequencyFraction(
          TextFunctions.bigrams(col("_t"))), 4).as("top_bigram_frac"),
        round(TextFunctions.englishScore(TextFunctions.tokens(col("_t"))), 4)
          .as("en_score"))
      .join(lm, Seq(idCol), "left")
    val checks: Seq[(String, Column)] = Seq(
      "length" -> (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens),
      "alpha" -> (col("alpha_ratio") >= minAlpha),
      "repetition" -> (col("n_tokens") < minTokens ||
        col("top_bigram_frac") <= maxTopBigramFrac),
      "lang" -> (col("en_score") >= minEnScore),
      "lm" -> (col("avg_logprob").isNotNull && col("avg_logprob") >= minAvgLogprob))
    // concat_ws skips nulls: passed checks vanish from the report
    val reasons = concat_ws(",",
      checks.map { case (n, ok) => when(!ok, lit(n)) }: _*)
    base.select(col(idCol), col("n_tokens"), col("alpha_ratio"),
      col("top_bigram_frac"), col("en_score"), col("avg_logprob"),
      (reasons === "").as("keep"), reasons.as("reasons"))
  }
}
