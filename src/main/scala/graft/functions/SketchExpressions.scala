package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the sketch/similarity hot loops.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * interpreted — every lambda application allocates and evaluates an
  * expression tree per element. For MinHash (shingles × numHashes),
  * SimHash (tokens × 64 bits) and cosine (dim-64 float arrays) that
  * interpretation dominated the runtime (q20 was 46 s of a 68 s
  * sf0.01 bench). These expressions run the same math as a tight
  * compiled loop and participate in whole-stage codegen via a static
  * helper call — the generated code is a single virtual-call per row,
  * the loop itself is JIT-compiled Scala.
  *
  * Hash family: one xxhash64 of each shingle/token (seed 42, Spark's
  * own XXH64), then per-index derived hashes via splitmix64 finalizing
  * mixes — the standard "one strong hash + cheap independent mixes"
  * MinHash construction.
  */
object Sketches {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val GOLDEN = 0x9e3779b97f4a7c15L

  /** MinHash over word k-shingles computed INSIDE the expression:
    * tokens are hashed once, each shingle hash is a polynomial
    * combination of its k token hashes (no shingle strings are ever
    * built, no interpreted HOF in the loop), and the signature is the
    * per-index min of mix64-derived hashes. Duplicate shingles are
    * irrelevant to a min, so no dedup pass is needed. Documents
    * shorter than k tokens hash their whole token stream as one
    * shingle (matching Dedup.shingles semantics). */
  def minHashShingled(tokens: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val P = 0xc2b2ae3d27d4eb4fL
    val count = if (n < k) 1 else n - k + 1
    val width = math.min(k, n)
    var w = 0
    while (w < count) {
      var sh = 0L
      var j = 0
      while (j < width) { sh = sh * P + th(w + j); j += 1 }
      sh = mix64(sh)
      var h = 0
      while (h < numHashes) {
        val g = mix64(sh + (h + 1) * GOLDEN)
        if (g < mins(h)) mins(h) = g
        h += 1
      }
      w += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, mix64(GOLDEN)) // empty doc: fixed sig
    new GenericArrayData(mins)
  }

  /** MinHash signature: mins(j) = min over elems of mix64(xxh64(elem) + (j+1)*GOLDEN). */
  def minHashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val base = XxHash64Function.hash(s, StringType, 42L)
      var j = 0
      while (j < numHashes) {
        val g = mix64(base + (j + 1) * GOLDEN)
        if (g < mins(j)) mins(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token array: bit j set iff the count of
    * elements whose hash has bit j set exceeds half. */
  def simHash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XxHash64Function.hash(s, StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Cosine similarity of two float arrays, accumulated in double;
    * 0.0 on zero norms or length mismatch. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return 0.0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Fraction of agreeing positions between two equal-length long
    * arrays (MinHash Jaccard estimate). */
  def sigAgreement(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n == 0 || n != b.numElements()) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** Exact Jaccard similarity of two string arrays treated as sets.
    * Hash-set membership on the smaller side — O(n+m), vs the
    * interpreted O(n·m)-ish array_intersect expression chain. */
  def jaccardStr(a: ArrayData, b: ArrayData): Double = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nl = large.numElements()
    if (ns == 0 && nl == 0) return 1.0
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    val nSmall = set.size  // distinct count of the small side
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](nl * 2)
    var inter = 0
    var nLarge = 0
    i = 0
    while (i < nl) {
      val v = large.getUTF8String(i)
      if (seen.add(v)) {
        nLarge += 1
        if (set.contains(v)) inter += 1
      }
      i += 1
    }
    val union = nSmall + nLarge - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Jaccard of two SORTED long arrays (each already distinct):
    * linear merge counting the intersection — no per-element hashing,
    * the cheapest exact pair verifier. */
  def jaccardSortedLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Distinct sorted xxhash64 of each string element — the compact
    * per-document "token set" fed to jaccardSortedLong. */
  def hashedTokenSet(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place
    var out = 0
    i = 0
    while (i < n) {
      if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** Word n-grams of a token array as space-joined strings, built in
    * one compiled pass. The zip_with-over-shifted-slices formulation
    * this replaces is interpreted per element (lambda evaluation +
    * per-gram expression-tree walk); for 8-grams over a corpus the
    * interpretation dominated the scan (q50).
    *
    * @param dedup        keep only the first occurrence of each gram
    *                     (shingle-set semantics)
    * @param emptyIfShort docs with fewer than n tokens yield an empty
    *                     array (bigram semantics) instead of one
    *                     whole-doc gram (shingle semantics)
    */
  def wordNgrams(arr: ArrayData, n: Int, dedup: Boolean,
                 emptyIfShort: Boolean): ArrayData = {
    val len = arr.numElements()
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    if (len < n) {
      if (emptyIfShort) return new GenericArrayData(Array.empty[Any])
      val all = new Array[org.apache.spark.unsafe.types.UTF8String](len)
      var i = 0
      while (i < len) { all(i) = arr.getUTF8String(i); i += 1 }
      return new GenericArrayData(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.concatWs(space, all: _*)))
    }
    val count = len - n + 1
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.ArrayList[Any](count)
    val seen = if (dedup)
      new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](count * 2)
    else null
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var w = 0
    while (w < count) {
      var j = 0
      while (j < n) { window(j) = toks(w + j); j += 1 }
      val gram = org.apache.spark.unsafe.types.UTF8String.concatWs(space, window: _*)
      if (seen == null || seen.add(gram)) out.add(gram)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** 64-bit signed-random-projection (SRP) signature of a float
    * vector: bit b is the sign of the dot product with a fixed
    * Rademacher (±1) hyperplane whose components derive from mix64 —
    * deterministic, no stored projection matrix, no randomness. Two
    * vectors' signature Hamming distance estimates their angle
    * (P[bit differs] = θ/π), so Hamming-banded blocking over SRP
    * signatures is the embedding-space analog of SimHash blocking. */
  def srpSignature(vec: ArrayData): Long = {
    val dim = vec.numElements()
    var sig = 0L
    var b = 0
    while (b < 64) {
      var dot = 0.0
      val base = (b + 1L) * GOLDEN
      var j = 0
      while (j < dim) {
        // sign bit of a full-avalanche mix → ±1 component
        val r = if (mix64(base + j) < 0) -1.0 else 1.0
        dot += r * vec.getFloat(j)
        j += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Per-row term-frequency map of a token array — one hash-count
    * pass. Turning tf computation into a scan-side expression removes
    * the corpus-wide (doc, term) aggregation shuffle entirely: the
    * exploded output is already grouped, because grouping by document
    * is free inside the row. */
  def tokenCounts(arr: ArrayData): org.apache.spark.sql.catalyst.util.MapData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      m.merge(arr.getUTF8String(i), 1L,
        (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.valueOf(a + b))
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next(); keys(j) = e.getKey; vals(j) = e.getValue.longValue(); j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Fraction of the array taken by its most frequent element, in one
    * hash-count pass (no per-element interpreted lambda, no sort). */
  def topFreqFraction(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(arr.getUTF8String(i), 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      if (c > best) best = c
      i += 1
    }
    best.toDouble / n
  }

  /** Containment |A∩B| / |A| of two sorted-distinct long arrays (the
    * asymmetric near-dup measure: "how much of A is inside B" — quote
    * detection, doc-in-doc contamination). Same linear merge as
    * jaccardSortedLong. Empty A → 0.0 by convention. */
  def containmentSortedLong(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / n
  }

  private[functions] def requireType(actual: DataType, expected: ArrayType,
                                     name: String): TypeCheckResult =
    actual match {
      case ArrayType(et, _) if et == expected.elementType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects ${expected.simpleString}, got ${other.simpleString}")
    }

  private[functions] def requireTypes(children: Seq[Expression], expected: ArrayType,
                                      name: String): TypeCheckResult =
    children.map(c => requireType(c.dataType, expected, name))
      .collectFirst { case f: TypeCheckResult.TypeCheckFailure => f }
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  // Column-facing wrappers
  def minhash_signature(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), numHashes))
  def minhash_shingled(tokens: Column, k: Int, numHashes: Int): Column =
    Bridge.column(MinHashShingled(Bridge.expression(tokens), k, numHashes))
  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))
  def cosine_f(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarityF(
      Bridge.expression(a), Bridge.expression(b)))
  def sig_agreement(a: Column, b: Column): Column =
    Bridge.column(SigAgreement(
      Bridge.expression(a), Bridge.expression(b)))
  def jaccard_str(a: Column, b: Column): Column =
    Bridge.column(JaccardStr(
      Bridge.expression(a), Bridge.expression(b)))
  def jaccard_sorted_long(a: Column, b: Column): Column =
    Bridge.column(JaccardSortedLong(
      Bridge.expression(a), Bridge.expression(b)))
  def hashed_token_set(c: Column): Column =
    Bridge.column(HashedTokenSet(Bridge.expression(c)))
  def containment_sorted_long(a: Column, b: Column): Column =
    Bridge.column(ContainmentSortedLong(
      Bridge.expression(a), Bridge.expression(b)))
  def word_ngrams(tokens: Column, n: Int, dedup: Boolean,
                  emptyIfShort: Boolean): Column =
    Bridge.column(WordNgrams(Bridge.expression(tokens), n, dedup, emptyIfShort))
  def top_freq_fraction(c: Column): Column =
    Bridge.column(TopFreqFraction(Bridge.expression(c)))
  def token_counts(c: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(c)))
  def srp_signature(c: Column): Column =
    Bridge.column(SrpSignature(Bridge.expression(c)))

  // Spark's own runtime-filter bloom expressions (the machinery behind
  // spark.sql.optimizer.runtimeFilter.bloomFilter.enabled), exposed as
  // column functions so operators can build/probe filters EXPLICITLY —
  // the optimizer only injects them into equi-join shapes it recognizes,
  // and an incremental-dedup prefilter is not one of them. Values are
  // keyed by xxhash64 (seed 42), matching InjectRuntimeFilter; a 64-bit
  // hash collision can only produce a false POSITIVE, which the exact
  // verification path absorbs.

  /** Aggregate: serialized bloom filter (binary) over xxhash64(c).
    * numBits per the standard sizing m = n·ln(1/p)/ln²2. */
  def bloom_agg(c: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0 && fpp > 0.0 && fpp < 1.0,
      "bloom_agg needs expectedItems > 0 and fpp in (0,1)")
    val numBits = math.ceil(
      expectedItems * math.log(1.0 / fpp) / (math.log(2.0) * math.log(2.0))).toLong
    Bridge.column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(Bridge.expression(c))),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())
  }

  /** Probe: might xxhash64(c) be in the serialized filter? False ⇒
    * definitely absent; true ⇒ verify exactly. */
  def bloom_might_contain(bloom: Column, c: Column): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      Bridge.expression(bloom),
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(Bridge.expression(c)))))
}

/** MinHash signature of an array<string> of shingles → array<bigint>. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(StringType), prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.minHashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.minHashSig($c, $numHashes);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** SimHash of an array<string> of tokens → bigint. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(StringType), prettyName)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.simHash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.simHash64($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Cosine similarity of two array<float> columns → double. */
case class CosineSimilarityF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireTypes(Seq(left, right), ArrayType(FloatType), prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.cosineF($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarityF =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity_f"
}

/** Agreement fraction of two array<bigint> MinHash signatures → double. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireTypes(Seq(left, right), ArrayType(LongType), prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.sigAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.sigAgreement($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreement =
    copy(left = l, right = r)
  override def prettyName: String = "sig_agreement"
}

/** Exact set-Jaccard of two array<string> columns → double. */
case class JaccardStr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireTypes(Seq(left, right), ArrayType(StringType), prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.jaccardStr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.jaccardStr($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardStr =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_str"
}

/** Jaccard of two sorted-distinct array<bigint> columns → double. */
case class JaccardSortedLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireTypes(Seq(left, right), ArrayType(LongType), prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.jaccardSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.jaccardSortedLong($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedLong =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted_long"
}

/** array<string> → sorted distinct array<bigint> of element hashes. */
case class HashedTokenSet(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(StringType), prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.hashedTokenSet(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.hashedTokenSet($c);")
  override protected def withNewChildInternal(newChild: Expression): HashedTokenSet =
    copy(child = newChild)
  override def prettyName: String = "hashed_token_set"
}

/** Containment |A∩B|/|A| of two sorted-distinct array<bigint> → double. */
case class ContainmentSortedLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireTypes(Seq(left, right), ArrayType(LongType), prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.containmentSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.containmentSortedLong($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ContainmentSortedLong =
    copy(left = l, right = r)
  override def prettyName: String = "containment_sorted_long"
}

/** Word n-grams of an array<string> of tokens → array<string>. */
case class WordNgrams(child: Expression, n: Int, dedup: Boolean,
                      emptyIfShort: Boolean) extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(StringType), prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.wordNgrams(input.asInstanceOf[ArrayData], n, dedup, emptyIfShort)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.wordNgrams($c, $n, $dedup, $emptyIfShort);")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}

/** SRP signature of an array<float> vector → bigint. */
case class SrpSignature(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(FloatType), prettyName)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.srpSignature(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.srpSignature($c);")
  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
  override def prettyName: String = "srp_signature"
}

/** Term-frequency map of an array<string> → map<string,bigint>. */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(StringType), prettyName)
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.tokenCounts(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.tokenCounts($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
  override def prettyName: String = "token_counts"
}

/** Most-frequent-element fraction of an array<string> → double. */
case class TopFreqFraction(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(StringType), prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    Sketches.topFreqFraction(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.topFreqFraction($c);")
  override protected def withNewChildInternal(newChild: Expression): TopFreqFraction =
    copy(child = newChild)
  override def prettyName: String = "top_freq_fraction"
}

/** MinHash over word k-shingles of an array<string> of tokens →
  * array<bigint>; shingling happens inside the compiled loop. */
case class MinHashShingled(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k > 0 && numHashes > 0, "k and numHashes must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireType(child.dataType, ArrayType(StringType), prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.minHashShingled(input.asInstanceOf[ArrayData], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.minHashShingled($c, $k, $numHashes);")
  override protected def withNewChildInternal(newChild: Expression): MinHashShingled =
    copy(child = newChild)
  override def prettyName: String = "minhash_shingled"
}
