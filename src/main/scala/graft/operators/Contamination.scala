package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark-contamination detection: for every candidate training
  * document, how much of it appears verbatim (at n-gram granularity)
  * in a held-out benchmark set.
  *
  * Shape: explode each probe document into its DISTINCT word n-grams
  * (one row per n-gram), inner-join against the distinct n-gram set
  * of the benchmark corpus, count matches per document. The benchmark
  * side is tiny relative to the corpus (eval sets are thousands of
  * documents, the corpus is billions) so the join broadcasts; the
  * probe side never shuffles more than (doc_id, ngram) rows, and the
  * per-doc aggregation is map-side partial. Filtering to
  * `minOverlapRatio` at the end gives the standard decontamination
  * list.
  *
  * n-grams are joined as STRINGS, not engine-seeded hashes, so the
  * operator is oracle-checkable; at extreme scale swap the join key
  * for xxhash64(ngram) to shuffle 8-byte keys (same plan shape).
  */
object Contamination {

  /** n-gram strings of a text column (distinct, space-joined). */
  private def ngrams(textCol: String, n: Int) =
    Dedup.shingles(col(textCol), n)

  /** @param probe     candidate training documents
    * @param benchmark held-out eval documents (small side)
    * @return one row per probe doc: n-gram total, overlap count, ratio
    */
  def ngramOverlap(probe: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String,
                   n: Int = 8): DataFrame = {
    val probeGrams = probe.select(col(idCol).as("doc_id"),
      explode(ngrams(textCol, n)).as("ng"))
    val benchGrams = benchmark
      .select(explode(ngrams(textCol, n)).as("ng"))
      .distinct()
    probeGrams
      .join(broadcast(benchGrams.withColumn("_hit", lit(1))), Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        count(col("_hit")).as("n_contaminated"))
      .withColumn("overlap_ratio",
        col("n_contaminated").cast("double") / col("n_ngrams").cast("double"))
  }
}
