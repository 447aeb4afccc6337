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
  * job. Matching is on UTF-8 BYTES with a dense per-state transition
  * table (fail links folded in at build time — the deterministic AC
  * automaton), which is sound for any pattern because UTF-8 is
  * self-synchronizing: a multi-byte pattern matches exactly at the
  * code-point sequence it encodes.
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

  /** Compiled automaton. `delta` is the dense transition table
    * (numStates × 256, fail links pre-applied); `outputs(s)` lists the
    * pattern ids whose occurrence ends when state `s` is reached.
    * Equality is BY PATTERN LIST (the automaton is a pure function of
    * it): expressions embedding an automaton must compare semantically
    * equal across two compilations of the same literal list, or
    * Catalyst rejects valid GROUP BY usage and loses subexpression
    * elimination for repeated calls. */
  final class Automaton private[Blocklist] (
      private[Blocklist] val patterns: Seq[String],
      val numPatterns: Int,
      private[Blocklist] val delta: Array[Int],
      private[Blocklist] val outputs: Array[Array[Int]]) extends Serializable {
    override def equals(o: Any): Boolean = o match {
      case a: Automaton => a.patterns == patterns
      case _ => false
    }
    override def hashCode(): Int = patterns.hashCode()
    override def toString: String = s"Automaton(${patterns.mkString(",")})"
  }

  /** Build the deterministic Aho-Corasick automaton for `patterns`
    * (UTF-8 byte patterns; order defines the output count indexes).
    *
    * Memory shape: the tables are DENSE — `delta` is numStates × 256
    * ints in the compiled automaton (4 KiB per trie state, task-
    * serialized with the plan) and the transient build allocates
    * maxStates × 256. That is the right trade for literal-list call
    * sites (hundreds of phrases ⇒ single-digit MiB, and the dense
    * row turns each input byte into one array load). A 10⁴–10⁵-state
    * external blocklist would mean tens-to-hundreds of MiB per
    * serialized automaton — at that size switch to byte-indexed
    * sparse rows or a double-array trie before shipping it into a
    * plan. */
  def compile(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty blocklist: nothing to match")
    require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")
    require(patterns.distinct.size == patterns.size, "duplicate pattern")
    val pats = patterns.map(_.getBytes("UTF-8")).toArray
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

  /** Hot-loop entry the generated code calls: per-pattern occurrence
    * counts over the input's UTF-8 bytes. */
  def countMatches(text: UTF8String, a: Automaton): ArrayData = {
    val counts = new Array[Long](a.numPatterns)
    val bytes = text.getBytes
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = a.delta(s * 256 + (bytes(i) & 0xFF))
      val out = a.outputs(s)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Per-pattern occurrence counts: array<long> aligned with
    * `patterns` order. */
  def matchCounts(text: Column, patterns: Seq[String]): Column =
    Bridge.column(BlocklistCounts(Bridge.expression(text), compile(patterns)))
}

/** string → array<long> of per-pattern match counts via the compiled
  * loop in [[Blocklist.countMatches]]. The automaton rides the plan as
  * a codegen reference object (serialized once per task, not per row). */
case class BlocklistCounts(child: Expression, automaton: Blocklist.Automaton)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Blocklist.countMatches(input.asInstanceOf[UTF8String], automaton)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("blocklistAutomaton", automaton,
      classOf[Blocklist.Automaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Blocklist.countMatches($c, $autoRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): BlocklistCounts =
    copy(child = newChild)
  override def prettyName: String = "blocklist_counts"
}
