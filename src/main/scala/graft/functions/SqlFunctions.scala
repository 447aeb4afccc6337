package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql` queries can use them directly:
  *
  *   SELECT graft_minhash(shingles, 64), graft_simhash(tokens),
  *          graft_cosine(a, b), graft_jaccard(ta, tb)
  *
  * Session-scoped (temp functions). The GraftExtensions entry point
  * calls this for SQL-first deployments.
  */
object SqlFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash",
      exprs => MinHashSignature(exprs.head, intLit(exprs(1), "numHashes")),
      "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarityF(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sig_agreement",
      exprs => SigAgreement(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_jaccard",
      exprs => JaccardStr(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_token_set",
      exprs => HashedTokenSet(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_containment",
      exprs => ContainmentSortedLong(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_ngrams",
      exprs => WordNgrams(exprs.head, intLit(exprs(1), "n"),
        dedup = true, emptyIfShort = false), "built-in")
    reg.createOrReplaceTempFunction("graft_top_freq_fraction",
      exprs => TopFreqFraction(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_token_counts",
      exprs => TokenCounts(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalize(exprs.head), "built-in")
    // the blocklist compiles per CALL SITE from string literals —
    // the automaton builds once at plan time and rides codegen, so
    // SQL users get the same one-pass scan as the Scala API
    reg.createOrReplaceTempFunction("graft_blocklist_counts",
      exprs => BlocklistCounts(exprs.head, Blocklist.compile(
        exprs.tail.map {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"blocklist patterns must be string literals, got $other")
        })), "built-in")
  }
}
