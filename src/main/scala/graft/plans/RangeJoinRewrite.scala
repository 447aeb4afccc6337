package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DateType}

/** Optimizer rule: rewrite date-spine range joins to linear explode.
  *
  * The reference expresses per-day expansion as a calendar cross join
  * with range bounds (reference: deferred_revenue.sql:112-122) or a
  * non-equi inner join (recognized_revenue.sql:92-94). Spark has no
  * range-join strategy, so both plan as BroadcastNestedLoopJoin —
  * every fact row tested against every spine row: O(|fact|·|spine|)
  * compares for an output of only O(Σ days-in-range). At 100 TB the
  * BNLJ is the difference between a job that finishes and one that
  * doesn't.
  *
  * Pattern matched:  fact JOIN spine ON spine.d >= lo AND spine.d <(=) hi
  * where the spine side outputs exactly one date column and lo/hi are
  * expressions over the fact side.
  *
  * Rewrite:          Generate(explode(sequence(lo, hi')), fact)
  *                   INNER JOIN spine ON d = spine.d
  * The generated attribute reuses the spine column's exprId, so every
  * downstream reference resolves unchanged. The inner equi join keeps
  * the result identical in every case the nested loop handled: a
  * spine narrower than [lo, hi] (capped calendar) still filters, and
  * a spine with DUPLICATE dates still multiplies output rows exactly
  * as the original join did — which is why this is an equi join and
  * not a semi join (a semi join would silently collapse duplicate
  * spine rows; asserted in RangeJoinRewriteSpec). Membership is
  * checked against a hash relation instead of a nested loop — and it
  * broadcasts, because a date spine is always tiny.
  *
  * Disable with spark.graft.rangeJoinRewrite=false.
  *
  * Register via `.withExtensions(new GraftExtensions)` or
  * spark.sql.extensions=graft.plans.GraftExtensions.
  */
object RangeJoinToExplodeRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rangeJoinRewrite", "true").toBoolean

  /** Normalized bound: the comparison constrains `attr` against
    * `bound` (an expression over the fact side). */
  private case class Bound(attr: Attribute, bound: Expression,
                           isLower: Boolean, inclusive: Boolean)

  private def asBound(e: Expression, spineAttr: Attribute): Option[Bound] = {
    def is(a: Expression) = a.references.size == 1 &&
      a.references.head.semanticEquals(spineAttr) && a.isInstanceOf[Attribute]
    e match {
      case GreaterThanOrEqual(a, b) if is(a) => Some(Bound(spineAttr, b, isLower = true, inclusive = true))
      case GreaterThan(a, b) if is(a)        => Some(Bound(spineAttr, b, isLower = true, inclusive = false))
      case LessThanOrEqual(a, b) if is(a)    => Some(Bound(spineAttr, b, isLower = false, inclusive = true))
      case LessThan(a, b) if is(a)           => Some(Bound(spineAttr, b, isLower = false, inclusive = false))
      case GreaterThanOrEqual(b, a) if is(a) => Some(Bound(spineAttr, b, isLower = false, inclusive = true))
      case GreaterThan(b, a) if is(a)        => Some(Bound(spineAttr, b, isLower = false, inclusive = false))
      case LessThanOrEqual(b, a) if is(a)    => Some(Bound(spineAttr, b, isLower = true, inclusive = true))
      case LessThan(b, a) if is(a)           => Some(Bound(spineAttr, b, isLower = true, inclusive = false))
      case _ => None
    }
  }

  private def spineAttrOf(p: LogicalPlan): Option[Attribute] = p.output match {
    case Seq(a) if a.dataType == DateType => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val candidates = Seq(
          (right, left, spineAttrOf(right)), // spine on the right
          (left, right, spineAttrOf(left)))  // spine on the left
        candidates.collectFirst {
          case (spine, fact, Some(dAttr))
              if splitBounds(cond, dAttr, fact).isDefined =>
            val (lo, hi) = splitBounds(cond, dAttr, fact).get
            rewrite(j, fact, spine, dAttr, lo, hi)
        }.getOrElse(j)
    }
  }

  /** Returns (inclusive lower, inclusive upper) date expressions over
    * the fact side, or None if the condition isn't a plain range. */
  private def splitBounds(cond: Expression, dAttr: Attribute,
                          fact: LogicalPlan): Option[(Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    val bounds = conjuncts.flatMap(asBound(_, dAttr))
    if (bounds.size != 2) return None
    val factRefsOk = bounds.forall(_.bound.references.subsetOf(fact.outputSet))
    val datesOk = bounds.forall(_.bound.dataType == DateType)
    (bounds.find(_.isLower), bounds.find(!_.isLower)) match {
      case (Some(l), Some(u)) if factRefsOk && datesOk =>
        val lo = if (l.inclusive) l.bound else DateAdd(l.bound, Literal(1))
        val hi = if (u.inclusive) u.bound else DateSub(u.bound, Literal(1))
        Some((lo, hi))
      case _ => None
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  private def rewrite(orig: Join, fact: LogicalPlan, spine: LogicalPlan,
                      dAttr: Attribute, lo: Expression, hi: Expression): LogicalPlan = {
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    val seq = new Sequence(lo, hi, None, tz)
    // guard: sequence(a, b) DESCENDS when a > b — null it out instead
    // (explode drops null arrays, matching inner-join emptiness)
    val guarded = If(LessThanOrEqual(lo, hi), seq,
      Literal.create(null, ArrayType(DateType)))
    val gen = Generate(Explode(guarded), unrequiredChildIndex = Nil,
      outer = false, qualifier = None,
      generatorOutput = Seq(dAttr.toAttribute),
      child = fact)
    // membership-and-multiplicity check against the (possibly narrower,
    // possibly duplicated) spine — tiny build side, plans as a
    // broadcast hash join. Inner, not semi: duplicate spine dates must
    // multiply output exactly as the original nested-loop join did.
    val freshOut = dAttr.newInstance()
    val spineAliased = Project(
      Seq(Alias(dAttr, dAttr.name + "_spine")(exprId = freshOut.exprId)), spine)
    val inner = Join(gen, spineAliased, Inner,
      Some(EqualTo(dAttr.toAttribute, freshOut.withName(dAttr.name + "_spine"))),
      JoinHint.NONE)
    // restore the original output order (join output = left ++ right);
    // the aliased spine date is projected away
    Project(orig.output, inner)
  }
}

/** SparkSessionExtensions entry point for the engine's Catalyst
  * additions: the range-join rewrite rule plus the graft_* SQL
  * functions. Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or  --conf spark.sql.extensions=graft.plans.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions._

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinToExplodeRule)
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, numHashes) - MinHash signature"),
      exprs => MinHashSignature(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"numHashes literal required, got $other")
      })))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash"),
      exprs => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine of float arrays"),
      exprs => CosineSimilarityF(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "graft_jaccard(a, b) - exact set Jaccard of string arrays"),
      exprs => JaccardStr(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_sig_agreement"),
      info("graft_sig_agreement", "graft_sig_agreement(a, b) - fraction of agreeing signature slots"),
      exprs => SigAgreement(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_token_set"),
      info("graft_token_set", "graft_token_set(tokens) - sorted distinct token hashes"),
      exprs => HashedTokenSet(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_containment"),
      info("graft_containment", "graft_containment(a, b) - |A∩B|/|A| of sorted hash arrays"),
      exprs => ContainmentSortedLong(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams", "graft_ngrams(tokens, n) - distinct word n-grams"),
      exprs => WordNgrams(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"n literal required, got $other")
      }, dedup = true, emptyIfShort = false)))
    ext.injectFunction((FunctionIdentifier("graft_top_freq_fraction"),
      info("graft_top_freq_fraction", "graft_top_freq_fraction(arr) - most-frequent-element fraction"),
      exprs => TopFreqFraction(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_token_counts"),
      info("graft_token_counts", "graft_token_counts(tokens) - term-frequency map"),
      exprs => TokenCounts(exprs.head)))
  }
}
