package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{Add, And, ArrayAggregate, ArrayFilter, ArrayIntersect, ArrayUnion, CaseWhen, Cast, Conv, CreateArray, Divide, ElementAt, EqualTo, Expression, Floor, Greatest, GreaterThan, LambdaFunction, Length, LessThan, LessThanOrEqual, Literal, Log, Md5, Multiply, Size, Slice, SortArray, Substring, Subtract, UnresolvedNamedLambdaVariable, ZipWith}

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

  // Catalyst mirrors of Cardinality.kmvEstimate / kmvUnionSketch /
  // jaccardOfUnion — identical arithmetic shape (divide by the
  // fraction, exact-under-k branch first), which is the cross-engine
  // replay contract the q131/q138/q144 oracles check bit-for-bit.
  private def dbl(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.DoubleType)

  private def kmvEstimate(sketch: Expression, k: Int): Expression =
    CaseWhen(
      Seq((LessThan(Size(sketch), Literal(k)), dbl(Size(sketch)))),
      Some(Divide(Literal((k - 1).toDouble),
        Divide(dbl(ElementAt(sketch, Literal(k))),
          Literal(graft.operators.Cardinality.HashSpace)))))

  private def kmvUnion(a: Expression, b: Expression, k: Int): Expression =
    Slice(SortArray(ArrayUnion(a, b), Literal(true)),
      Literal(1), Literal(k))

  private def kmvJaccardOfUnion(u: Expression, a: Expression,
                                b: Expression): Expression =
    CaseWhen(
      Seq((EqualTo(Size(u), Literal(0)), Literal(0.0))),
      Some(Divide(dbl(Size(ArrayIntersect(ArrayIntersect(u, a), b))),
        dbl(Size(u)))))

  private def dblLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  // Catalyst mirrors of SampleSketch.sketchQuantile / mergeSketch /
  // sketchRowEstimate — the same lower-index quantile rule and KMV
  // arithmetic, so stored sample sketches compose from plain
  // spark.sql (the q147 contract on the SQL surface). Field access
  // goes through UnresolvedExtractValue: a registry builder sees
  // pre-analysis children, so the analyzer resolves the struct
  // fields once the sketch column's schema is known.
  private def sampleQuantile(sketch: Expression, p: Double): Expression = {
    val vals = SortArray(UnresolvedExtractValue(sketch, Literal("v")),
      Literal(true))
    val idx = Add(Cast(Floor(Multiply(
      dbl(Subtract(Size(sketch), Literal(1))), Literal(p))),
      org.apache.spark.sql.types.IntegerType), Literal(1))
    CaseWhen(
      Seq((EqualTo(Size(sketch), Literal(0)),
        Literal(null, org.apache.spark.sql.types.DoubleType))),
      Some(ElementAt(vals, idx)))
  }

  private def sampleEstimate(sketch: Expression, k: Int): Expression =
    CaseWhen(
      Seq((LessThan(Size(sketch), Literal(k)), dbl(Size(sketch)))),
      Some(Divide(Literal((k - 1).toDouble),
        Divide(dbl(UnresolvedExtractValue(
          ElementAt(sketch, Literal(k)), Literal("h52"))),
          Literal(graft.operators.Cardinality.HashSpace)))))

  // Catalyst mirrors of Cardinality.hllUnion / hllEstimate — the HLL
  // register algebra on the SQL surface (q158's arithmetic verbatim:
  // exact integer-scaled harmonic sum, linear-counting branch).
  private def hllMerge(a: Expression, b: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    val y = UnresolvedNamedLambdaVariable(Seq("y"))
    ZipWith(a, b, LambdaFunction(Greatest(Seq(x, y)), Seq(x, y)))
  }

  private def hllEstimate(regs: Expression, p: Int): Expression = {
    // [4,11]: p >= 12 overflows the exact scaled harmonic sum — see
    // Cardinality.hllSketch
    require(p >= 4 && p <= 11, s"HLL precision p must be in [4,11]: $p")
    val m = 1 << p
    val remBits = 52 - p
    val pows = CreateArray((0 to remBits + 1).map(r => Literal(1L << (52 - r))))
    val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    val fin = UnresolvedNamedLambdaVariable(Seq("s"))
    val sumScaled = ArrayAggregate(regs, Literal(0L),
      LambdaFunction(Add(acc, Cast(ElementAt(pows, Add(x, Literal(1))),
        org.apache.spark.sql.types.LongType)), Seq(acc, x)),
      LambdaFunction(fin, Seq(fin)))
    // hllAlpha, not the inlined asymptotic formula: p = 4/5/6 need the
    // paper's exact small-m constants (see Cardinality.hllAlpha)
    val c = Literal(graft.operators.Cardinality.hllAlpha(m) * m * m *
      graft.operators.Cardinality.HashSpace)
    val raw = Divide(c, dbl(sumScaled))
    val z = UnresolvedNamedLambdaVariable(Seq("r"))
    val zeros = Size(ArrayFilter(regs,
      LambdaFunction(EqualTo(z, Literal(0)), Seq(z))))
    CaseWhen(
      Seq((And(LessThanOrEqual(raw, Literal(2.5 * m)),
        GreaterThan(zeros, Literal(0))),
        Multiply(Literal(m.toDouble),
          Log(Divide(Literal(m.toDouble), dbl(zeros)))))),
      Some(raw))
  }

  // Catalyst mirror of Audit.rowHash — the canonical N/V<len>:<value>
  // encoding + 52-bit md5 prefix, so SQL-first jobs can digest tables
  // with plain `SELECT sum(graft_row_hash(a, b, c))`-style aggregates
  // (cast to DECIMAL first — see Audit.tableDigest's overflow note).
  private def rowHash(cols: Seq[Expression]): Expression = {
    require(cols.nonEmpty, "graft_row_hash needs at least one column")
    val strType = org.apache.spark.sql.types.StringType
    val canon = cols.map { c =>
      val s = Cast(c, strType)
      CaseWhen(
        Seq((org.apache.spark.sql.catalyst.expressions.IsNull(c),
          Literal("N"))),
        Some(org.apache.spark.sql.catalyst.expressions.Concat(Seq(
          Literal("V"), Cast(Length(s), strType), Literal(":"), s))))
    }
    Cast(Conv(Substring(
      Md5(Cast(org.apache.spark.sql.catalyst.expressions.Concat(canon),
        org.apache.spark.sql.types.BinaryType)),
      Literal(1), Literal(13)),
      Literal(16), Literal(10)), org.apache.spark.sql.types.LongType)
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
    // KMV bottom-k sketch algebra over STORED sketch arrays — the
    // SQL-composable form of Cardinality.kmv* (sketches persisted by
    // one job compose in plain spark.sql in another, the cross-shard
    // cardinality story q131/q138 pin). k must be an integer literal:
    // it is sketch geometry, not data. Built as catalyst trees (a
    // registry builder must return Expressions; the public Column
    // combinators produce ColumnNodes that never reach the analyzer
    // from here) — mirrors of the Column definitions in
    // graft.operators.Cardinality, q144's oracle pinning the pair.
    reg.createOrReplaceTempFunction("graft_kmv_estimate",
      exprs => kmvEstimate(exprs.head, intLit(exprs(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_kmv_union",
      exprs => kmvUnion(exprs.head, exprs(1), intLit(exprs(2), "k")),
      "built-in")
    reg.createOrReplaceTempFunction("graft_kmv_jaccard",
      exprs => kmvJaccardOfUnion(kmvUnion(exprs.head, exprs(1),
        intLit(exprs(2), "k")), exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_kmv_intersection",
      exprs => {
        val k = intLit(exprs(2), "k")
        val u = kmvUnion(exprs.head, exprs(1), k)
        Multiply(kmvJaccardOfUnion(u, exprs.head, exprs(1)),
          kmvEstimate(u, k))
      }, "built-in")
    // hash-reservoir sample-sketch algebra over STORED sketch arrays
    // (array<struct<h52,id,v>>): quantiles, merges and row estimates
    // compose from plain spark.sql — q148 oracle-pins the surface
    reg.createOrReplaceTempFunction("graft_sample_quantile",
      exprs => sampleQuantile(exprs.head, dblLit(exprs(1), "p")), "built-in")
    reg.createOrReplaceTempFunction("graft_sample_merge",
      exprs => Slice(SortArray(ArrayUnion(exprs.head, exprs(1)),
        Literal(true)), Literal(1), Literal(intLit(exprs(2), "k"))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_sample_estimate",
      exprs => sampleEstimate(exprs.head, intLit(exprs(1), "k")), "built-in")
    // PSL registered domain: rules live in the jar resource (parsed
    // once per JVM), so the SQL surface gets the same O(labels)
    // codegen'd lookup as the Scala API with nothing but the host
    // expression in the plan
    // HLL register algebra over STORED register arrays — merge is
    // element-wise max (closure), estimate replays q158's arithmetic
    reg.createOrReplaceTempFunction("graft_row_hash",
      exprs => rowHash(exprs), "built-in")
    reg.createOrReplaceTempFunction("graft_hll_merge",
      exprs => hllMerge(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_hll_estimate",
      exprs => hllEstimate(exprs.head, intLit(exprs(1), "p")), "built-in")
    reg.createOrReplaceTempFunction("graft_registered_domain",
      exprs => graft.operators.PslRegisteredDomain(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_blocklist_counts",
      exprs => BlocklistCounts(exprs.head, Blocklist.compileAuto(
        exprs.tail.map {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"blocklist patterns must be string literals, got $other")
        })), "built-in")
  }
}
