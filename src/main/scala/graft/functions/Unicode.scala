package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus curation: the same logical
  * document arrives from the web in many byte encodings of the same
  * characters (composed vs decomposed accents, NFC vs NFD sources),
  * and every downstream exact-match operator — fingerprint dedup,
  * line dedup, blocklists, token counts — silently treats them as
  * different text unless ingestion canonicalizes first. Standard
  * practice (and what the q135 oracle pins cross-engine against
  * DuckDB's nfc_normalize) is NFC plus a control-character strip.
  *
  * NFC is a real Catalyst expression around `java.text.Normalizer`
  * (ICU-free JDK implementation of UAX #15) — codegen'd, with a
  * fast-path: `Normalizer.isNormalized` is O(n) with no allocation
  * and almost all real text IS already NFC, so the scan pays the
  * normalization allocation only on the rows that need it.
  *
  * Reference scope: the reference pipeline ingests API JSON and
  * normalizes nothing — north-star surface (web curation).
  */
object Unicode {

  /** NFC-normalize a string column (UAX #15 canonical composition). */
  def nfc(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  /** Portable control-character class: C0 controls minus \t \n \r,
    * plus DEL. Spelled in \xNN ranges valid in BOTH Java regex and
    * RE2, so the oracle strips the identical set. */
  val ControlClass: String = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

  /** Strip non-whitespace control characters (keeps \t \n \r). */
  def stripControls(text: Column): Column =
    regexp_replace(text, ControlClass, "")

  /** The curation composite: control strip, then NFC. */
  def normalize(text: Column): Column = nfc(stripControls(text))

  /** Planted suffixes for the oracle-pinned catalog query (q135):
    * decomposed accents (NFC composes), conjoining Hangul jamo,
    * already-composed text (NFC-stable fast path), pure ASCII, and
    * control characters for the strip stage. */
  val DemoVariants: Seq[String] = Seq(
    "café visit",
    "über cool",
    "Å" + "ngström",
    "가 hangul jamo",
    "café composed already",
    "plain ascii",
    "bellstrip me",
    "mixed éend")

  /** Hot-loop entry the generated code calls. */
  def nfcImpl(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** string → NFC-normalized string via [[Unicode.nfcImpl]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Unicode.nfcImpl(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Unicode.nfcImpl($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}
