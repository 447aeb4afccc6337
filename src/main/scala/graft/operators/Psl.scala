package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list registered-domain extraction — the real PSL
  * algorithm (publicsuffix.org/list: longest-match over exact,
  * `*.`-wildcard and `!`-exception rules, with the implicit `*`
  * default making every unlisted TLD a one-label suffix) over a
  * checked-in rules snapshot at `graft/psl_snapshot.dat`.
  *
  * Why this exists: [[Curation.registeredDomain]]'s 13-suffix subset
  * collapses every `*.github.io` / `*.blogspot.com` site into ONE
  * cap bucket — at web scale that caps a million independent sites
  * to `maxPerKey` documents total. The snapshot ships the
  * hosting-platform private suffixes and the multi-label ccTLD
  * registrations, and the parser implements the full rule grammar,
  * so a verbatim upstream `public_suffix_list.dat` drops in
  * unchanged when exact upstream parity is needed.
  *
  * Scale shape: the rules live in the JAR as a resource and parse
  * once per JVM (executor-side lazy val) — the plan serializes an
  * empty expression node, never the rule table, and the lookup is
  * O(labels) hash probes per host inside whole-stage codegen. Extra
  * caller rules (`extraRules`) DO ride the plan; keep those lists
  * small or re-ship the resource instead.
  *
  * Reference scope: the reference pipeline has no web-curation stage
  * — north-star surface, same family as [[Curation]].
  */
object Psl {

  /** Parsed rule table: exact suffixes, wildcard parents (the labels
    * after `*.`), and exception suffixes (after `!`). */
  final case class Rules(exact: Set[String], wildcard: Set[String],
                         exception: Set[String]) {
    /** Longest rule length in labels, bounding the candidate scan. */
    val maxLabels: Int = {
      val all = exact.iterator.map(labelCount) ++
        wildcard.iterator.map(labelCount(_) + 1) ++
        exception.iterator.map(labelCount)
      if (all.isEmpty) 1 else all.max
    }
    private def labelCount(s: String): Int = s.count(_ == '.') + 1
  }

  /** Parse PSL-format text: one rule per line, `//` comments, blank
    * lines ignored, only the first whitespace-separated token of a
    * line is the rule (upstream carries trailing comments). */
  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+", 2)(0).toLowerCase
        if (rule.startsWith("!")) exc += rule.substring(1)
        else if (rule.startsWith("*.")) wild += rule.substring(2)
        else if (rule != "*") exact += rule
      }
    }
    Rules(exact.result(), wild.result(), exc.result())
  }

  /** The checked-in snapshot, parsed once per JVM (driver and each
    * executor read their own classpath copy — the rule table never
    * rides a task). */
  lazy val snapshot: Rules = {
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.dat")
    require(in != null, "resource /graft/psl_snapshot.dat missing from jar")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Number of labels in the host's public suffix under `rules`:
    * exception rules prevail (suffix = rule minus its leftmost
    * label), else the longest exact/wildcard match, else the
    * implicit `*` default of 1. Pure function of the label array —
    * shared verbatim by lookup and tests. */
  def publicSuffixLabels(labels: Array[String], rules: Rules): Int = {
    val n = labels.length
    var best = 1
    var i = 1
    val lim = math.min(n, rules.maxLabels)
    // build candidate suffix strings right-to-left, reusing a buffer
    val sb = new java.lang.StringBuilder
    while (i <= lim) {
      if (i > 1) sb.insert(0, '.')
      sb.insert(0, labels(n - i))
      val cand = sb.toString
      if (rules.exception.contains(cand)) return i - 1
      if (rules.exact.contains(cand)) best = i
      else if (i >= 2 && rules.wildcard.contains(cand.substring(labels(n - i).length + 1)))
        best = i
      i += 1
    }
    best
  }

  /** Registered domain of a lowercase hostname (feed it
    * [[Curation.urlHost]] output): public suffix plus one label.
    * Hosts that ARE a public suffix, single labels, and IPv4/IPv6
    * literals pass through unchanged — a cap keyed on them groups
    * exact-host, the same passthrough contract as
    * [[Curation.registeredDomain]]. */
  def registeredDomainImpl(host: String, rules: Rules): String = {
    if (host.isEmpty || host.indexOf(':') >= 0) return host // IPv6 / port residue
    val trimmed = if (host.endsWith(".")) host.substring(0, host.length - 1) else host
    if (trimmed.isEmpty) return host
    val labels = trimmed.split("\\.", -1)
    if (labels.length < 2) return host
    if (labels.forall(l => l.nonEmpty && l.forall(_.isDigit))) return host // IPv4
    val ps = publicSuffixLabels(labels, rules)
    if (labels.length <= ps) host
    else {
      val sb = new java.lang.StringBuilder
      var i = labels.length - ps - 1
      while (i < labels.length) {
        if (sb.length > 0) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
  }

  // ---- per-extra-rules lookup cache -------------------------------------
  // An expression instance with extraRules merges them into the
  // snapshot once per JVM (keyed by the rule list), not per row.
  private val merged =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Rules]()

  def rulesFor(extraRules: Seq[String]): Rules =
    if (extraRules.isEmpty) snapshot
    else merged.computeIfAbsent(extraRules, extras => {
      val r = parse(extras.iterator)
      Rules(snapshot.exact ++ r.exact, snapshot.wildcard ++ r.wildcard,
        snapshot.exception ++ r.exception)
    })

  /** Hot-loop entry the generated code calls. */
  def lookup(host: UTF8String, extraRules: Seq[String]): UTF8String = {
    val out = registeredDomainImpl(host.toString, rulesFor(extraRules))
    UTF8String.fromString(out)
  }

  /** Column API: PSL registered domain of a (lowercase) host column.
    * `extraRules` are additional PSL-format rules merged over the
    * snapshot (they serialize with the plan — keep small). */
  def registeredDomain(host: Column, extraRules: Seq[String] = Nil): Column =
    Bridge.column(PslRegisteredDomain(Bridge.expression(host), extraRules))
}

/** string host → PSL registered domain via [[Psl.lookup]]. The rule
  * table is a JVM-wide lazy parse of the jar resource; only
  * `extraRules` serializes with the plan. */
case class PslRegisteredDomain(child: Expression,
                               extraRules: Seq[String] = Nil)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Psl.lookup(input.asInstanceOf[UTF8String], extraRules)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("pslExtraRules", extraRules,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.Psl.lookup($c, $rulesRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): PslRegisteredDomain =
    copy(child = newChild)
  override def prettyName: String = "psl_registered_domain"
}
