package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen polynomial rolling-hash fingerprint of a STRING column:
  * fold (acc·31 + codepoint) mod 2147483647 over the text's code points —
  * the x10 document fingerprint (Karp–Rabin polynomial, public).
  *
  * Why a custom Expression (SURVEY §4.3 ladder, step b): SQL expresses
  * this fold only as `aggregate(split(text, ''), ...)` — one single-char
  * STRING OBJECT allocated per corpus character plus a non-codegen lambda
  * step per fold (measured: 2.4 s at sf0.1 for ~1.5 M chars, the hottest
  * row-local query in the registry). The generated code below walks the
  * UTF-8 bytes once — zero allocation, O(1) per code point, inside
  * WholeStageCodegen.
  *
  * Code-point semantics match the SQL formulation on both engines:
  * Spark's `split(text,'')` + `ascii` folds per character with the
  * character's code point, and DuckDB's replay is `ord()` over
  * `string_split(text,'')` — this walk decodes each UTF-8 sequence to the
  * same code point (ExprPropertySpec pins equality against the HOF form).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    RollingFingerprint.fp(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      // one static call — no boxing, stays inside the codegen span
      s"${ev.value} = graft.plans.RollingFingerprint.fp($s);")
}

object RollingFingerprint {
  /** (((0·31+cp₁)·31+cp₂)…) mod 2147483647 over the code points of s.
    * acc < 2³¹ and cp < 2²¹, so acc·31 + cp < 2³⁶ — no overflow, and all
    * terms are non-negative, so plain `%` == pmod == DuckDB's `%`. */
  def fp(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var acc = 0L
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      val len = UTF8String.numBytesForFirstByte(s.getByte(i))
      val cp = len match {
        case 1 => b0
        case 2 => ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f)
        case 3 => ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
          (s.getByte(i + 2) & 0x3f)
        case _ => ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
          ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f)
      }
      acc = (acc * 31 + cp) % 2147483647L
      i += len
    }
    acc
  }
}
