package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching (blocklist screening) via an
  * Aho-Corasick automaton — the curation stage that screens every
  * document against a list of banned/flagged phrases in ONE pass over
  * the text, instead of one `contains`/regex scan per pattern.
  *
  * Scale shape: the automaton is built once on the driver
  * (O(Σ pattern length) states), rides the plan as a codegen
  * reference object, and the match loop is byte-at-a-time over the
  * document — O(bytes + matches) per row regardless of how many
  * patterns the list holds. A contains() chain is O(patterns × bytes):
  * at 100 TB × a thousand-phrase blocklist that factor is the whole
  * job. Matching is on UTF-8 BYTES, which is sound for any pattern
  * because UTF-8 is self-synchronizing: a multi-byte pattern matches
  * exactly at the code-point sequence it encodes.
  *
  * Two compiled representations, same match semantics
  * ([[compileAuto]] picks by list size; the property spec pins their
  * equivalence):
  *  - DENSE ([[compile]]): fail links folded into a numStates × 256
  *    transition table — one array load per input byte, but 1 KiB of
  *    table per state. Right for literal-list call sites (hundreds of
  *    phrases ⇒ single-digit MiB serialized per task).
  *  - SPARSE ([[compileSparse]]): CSR goto rows + explicit fail
  *    links, O(Σ pattern bytes) ints total — a 10⁵-state external
  *    blocklist is a few MB instead of ~100 MiB. The match loop walks
  *    the fail chain on misses, which amortizes to O(bytes) over the
  *    document (each fail-walk step undoes a previous goto descent).
  *
  * Semantics: counts EVERY occurrence end position (overlapping
  * occurrences of self-overlapping patterns each count; one position
  * can end several patterns). Case handling belongs to the caller
  * (standard: `lower(text)` against a lowercase list).
  *
  * Reference scope: the reference pipeline has no text screening —
  * north-star surface (curation/safety filtering) beyond parity.
  */
object Blocklist {

  /** A compiled blocklist automaton: per-pattern occurrence counts in
    * one text pass. Equality is BY PATTERN LIST + representation (the
    * automaton is a pure function of both): expressions embedding an
    * automaton must compare semantically equal across two
    * compilations of the same literal list, or Catalyst rejects valid
    * GROUP BY usage and loses subexpression elimination for repeated
    * calls. [[compileAuto]] is deterministic per list, so equal lists
    * never yield mixed representations. */
  sealed trait Ac extends Serializable {
    def numPatterns: Int
    private[Blocklist] def patterns: Seq[String]
    /** Hot-loop entry the generated code calls. */
    def count(text: UTF8String): ArrayData
    override def equals(o: Any): Boolean = o match {
      case a: Ac => a.getClass == getClass && a.patterns == patterns
      case _ => false
    }
    override def hashCode(): Int = patterns.hashCode()
    override def toString: String =
      s"${getClass.getSimpleName}(${patterns.mkString(",")})"
  }

  /** Dense representation: `delta` is numStates × 256 with fail links
    * pre-applied; `outputs(s)` lists the pattern ids whose occurrence
    * ends when state `s` is reached. */
  final class Automaton private[Blocklist] (
      private[Blocklist] val patterns: Seq[String],
      val numPatterns: Int,
      private[Blocklist] val delta: Array[Int],
      private[Blocklist] val outputs: Array[Array[Int]]) extends Ac {
    def count(text: UTF8String): ArrayData = {
      val counts = new Array[Long](numPatterns)
      val bytes = text.getBytes
      var s = 0
      var i = 0
      while (i < bytes.length) {
        s = delta(s * 256 + (bytes(i) & 0xFF))
        val out = outputs(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
        i += 1
      }
      new GenericArrayData(counts)
    }
  }

  /** Sparse representation: CSR goto rows (`rowStart` offsets into
    * `tBytes`/`tTargets`, labels sorted per state for binary search)
    * plus explicit `fail` links; outputs folded along fails at build
    * like the dense form, so one state reach reports every suffix
    * match. */
  final class SparseAutomaton private[Blocklist] (
      private[Blocklist] val patterns: Seq[String],
      val numPatterns: Int,
      private[Blocklist] val rowStart: Array[Int],
      private[Blocklist] val tBytes: Array[Byte],
      private[Blocklist] val tTargets: Array[Int],
      private[Blocklist] val fail: Array[Int],
      private[Blocklist] val outputs: Array[Array[Int]]) extends Ac {

    /** numStates (diagnostic — the dense form would be 1 KiB each). */
    def numStates: Int = rowStart.length - 1

    private def goTo(s: Int, b: Byte): Int = {
      var lo = rowStart(s)
      var hi = rowStart(s + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val d = (tBytes(mid) & 0xFF) - (b & 0xFF)
        if (d == 0) return tTargets(mid)
        else if (d < 0) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    def count(text: UTF8String): ArrayData = {
      val counts = new Array[Long](numPatterns)
      val bytes = text.getBytes
      var s = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        var t = goTo(s, b)
        while (t < 0 && s != 0) { s = fail(s); t = goTo(s, b) }
        s = if (t < 0) 0 else t
        val out = outputs(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
        i += 1
      }
      new GenericArrayData(counts)
    }
  }

  private def checkPatterns(patterns: Seq[String]): Array[Array[Byte]] = {
    require(patterns.nonEmpty, "empty blocklist: nothing to match")
    require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")
    require(patterns.distinct.size == patterns.size, "duplicate pattern")
    patterns.map(_.getBytes("UTF-8")).toArray
  }

  /** Total-pattern-bytes threshold of [[compileAuto]]: up to ~4K trie
    * states the dense table tops out around 4 MiB serialized — cheap
    * against per-byte lookup speed; beyond it the sparse form wins on
    * task-serialization and build allocation. */
  val DenseByteLimit: Int = 4096

  /** Compile with the representation chosen by list size — the
    * default entry ([[matchCounts]], the SQL registration). */
  def compileAuto(patterns: Seq[String]): Ac =
    if (patterns.iterator.map(_.getBytes("UTF-8").length).sum <= DenseByteLimit)
      compile(patterns)
    else compileSparse(patterns)

  /** Build the deterministic (dense) Aho-Corasick automaton for
    * `patterns` (UTF-8 byte patterns; order defines the output count
    * indexes). Memory shape: numStates × 1 KiB serialized, transient
    * build allocates the same again — see [[compileSparse]] for large
    * external lists. */
  def compile(patterns: Seq[String]): Automaton = {
    val pats = checkPatterns(patterns)
    // trie build: goto graph with -1 holes
    val maxStates = pats.map(_.length).sum + 1
    val gotoT = Array.fill(maxStates * 256)(-1)
    val ends = Array.fill(maxStates)(List.empty[Int]) // pattern ids ending here
    var nStates = 1
    var p = 0
    while (p < pats.length) {
      var s = 0
      val bs = pats(p)
      var i = 0
      while (i < bs.length) {
        val b = bs(i) & 0xFF
        if (gotoT(s * 256 + b) < 0) { gotoT(s * 256 + b) = nStates; nStates += 1 }
        s = gotoT(s * 256 + b)
        i += 1
      }
      ends(s) ::= p
      p += 1
    }
    // BFS: fail links + folded delta + output-set union along fails
    val fail = new Array[Int](nStates)
    val delta = new Array[Int](nStates * 256)
    val queue = new java.util.ArrayDeque[Int]()
    var b = 0
    while (b < 256) {
      val t = gotoT(b)
      if (t < 0) delta(b) = 0
      else { delta(b) = t; fail(t) = 0; queue.add(t) }
      b += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      ends(s) = ends(s) ::: ends(fail(s)) // suffix matches end here too
      var c = 0
      while (c < 256) {
        val t = gotoT(s * 256 + c)
        if (t < 0) delta(s * 256 + c) = delta(fail(s) * 256 + c)
        else {
          delta(s * 256 + c) = t
          fail(t) = delta(fail(s) * 256 + c)
          queue.add(t)
        }
        c += 1
      }
    }
    new Automaton(patterns.toList, pats.length, delta,
      ends.take(nStates).map(_.toArray.sorted))
  }

  /** Build the sparse (CSR + fail links) automaton: O(Σ pattern
    * bytes) memory at build AND in the plan — the representation for
    * external blocklists too big to ship as dense tables. Match
    * results are identical to [[compile]]'s. */
  def compileSparse(patterns: Seq[String]): SparseAutomaton = {
    val pats = checkPatterns(patterns)
    // trie with per-state sorted TreeMaps (byte label → target)
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.TreeMap[Integer, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    var p = 0
    while (p < pats.length) {
      var s = 0
      val bs = pats(p)
      var i = 0
      while (i < bs.length) {
        val b = bs(i) & 0xFF
        val nxt = goto(s).get(b)
        if (nxt == null) {
          goto(s).put(b, goto.size)
          s = goto.size
          goto += new java.util.TreeMap[Integer, Integer]()
          ends += Nil
        } else s = nxt
        i += 1
      }
      ends(s) = p :: ends(s)
      p += 1
    }
    val n = goto.size
    val fail = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Int]()
    goto(0).forEach { (_, t) => fail(t) = 0; queue.add(t) }
    while (!queue.isEmpty) {
      val s = queue.poll()
      ends(s) = ends(s) ::: ends(fail(s))
      goto(s).forEach { (b, t) =>
        var f = fail(s)
        while (f != 0 && goto(f).get(b) == null) f = fail(f)
        val cand = goto(f).get(b)
        fail(t) = if (cand == null || cand == t) 0 else cand.intValue()
        queue.add(t)
      }
    }
    // freeze to CSR (TreeMap iteration is label-sorted)
    val rowStart = new Array[Int](n + 1)
    var total = 0
    var s = 0
    while (s < n) { rowStart(s) = total; total += goto(s).size(); s += 1 }
    rowStart(n) = total
    val tBytes = new Array[Byte](total)
    val tTargets = new Array[Int](total)
    s = 0
    var k = 0
    while (s < n) {
      goto(s).forEach { (b, t) =>
        tBytes(k) = b.byteValue(); tTargets(k) = t.intValue(); k += 1
      }
      s += 1
    }
    new SparseAutomaton(patterns.toList, pats.length, rowStart, tBytes,
      tTargets, fail, ends.toArray.map(_.toArray.sorted))
  }

  /** Per-pattern occurrence counts: array<long> aligned with
    * `patterns` order (representation picked by [[compileAuto]]). */
  def matchCounts(text: Column, patterns: Seq[String]): Column =
    Bridge.column(BlocklistCounts(Bridge.expression(text),
      compileAuto(patterns)))
}

/** string → array<long> of per-pattern match counts via the compiled
  * automaton's loop. The automaton rides the plan as a codegen
  * reference object (serialized once per task, not per row). */
case class BlocklistCounts(child: Expression, automaton: Blocklist.Ac)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    automaton.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("blocklistAutomaton", automaton,
      classOf[Blocklist.Ac].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $autoRef.count($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BlocklistCounts =
    copy(child = newChild)
  override def prettyName: String = "blocklist_counts"
}
