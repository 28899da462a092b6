package graft.plans

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}
import java.nio.CharBuffer
import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization expressions (SURVEY extension surface —
  * corpus-cleaning front door: CCNet/Gopher/RefinedWeb-style pipelines
  * normalize before any dedup so byte-different, render-identical documents
  * hash together).
  *
  * Native Catalyst expressions with `doGenCode` (SURVEY §4.3 ladder, step b):
  * both run inside whole-stage codegen via a static JVM helper, so the
  * normalize sits in the same generated loop as the digest/shingle kernels
  * it feeds — row-local, no shuffle, linear at 100 TB.
  */
object TextNorm {
  private val allowedForms = Set("NFC", "NFKC", "NFD", "NFKD")

  def isForm(f: String): Boolean = allowedForms.contains(f)

  def normalize(s: String, form: String): String =
    Normalizer.normalize(s, Normalizer.Form.valueOf(form))

  /** Mojibake repair: if the string round-trips windows-1252-encode →
    * UTF-8-decode cleanly AND that shrinks it (multi-byte sequences were
    * being displayed as multiple cp1252 chars), it WAS double-decoded text —
    * return the repaired form; otherwise return the input unchanged.
    * Both codecs run with CodingErrorAction.REPORT, so genuine non-cp1252
    * text or already-correct UTF-8 (e.g. a lone `é`) falls through to the
    * catch and is never corrupted. */
  private val cp1252 = Charset.forName("windows-1252")

  def repairMojibake(s: String): String =
    try {
      val enc = cp1252.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bytes = enc.encode(CharBuffer.wrap(s))
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val out = dec.decode(bytes).toString
      if (out.length < s.length) out else s
    } catch { case _: CharacterCodingException => s }
}

/** `nfc_normalize(s)` / `nfkc_normalize(s)` — Unicode normalization of a
  * string column (form fixed at plan time; DuckDB's `nfc_normalize` is the
  * oracle twin for NFC). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!TextNorm.isForm(form))
      TypeCheckResult.TypeCheckFailure(s"unknown normalization form $form")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      TextNorm.normalize(s.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"""graft.plans.TextNorm.normalize($c.toString(), "$form"))""")
}

/** `repair_mojibake(s)` — undo UTF-8-bytes-decoded-as-windows-1252 damage
  * ("cafÃ©" → "café"); a no-op on clean text. */
case class RepairMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "repair_mojibake"

  override protected def withNewChildInternal(newChild: Expression): RepairMojibake =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      TextNorm.repairMojibake(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.TextNorm.repairMojibake($c.toString()))")
}
