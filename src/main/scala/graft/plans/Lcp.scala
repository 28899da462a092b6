package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen longest-common-prefix length (in CHARACTERS) of two
  * STRING columns.
  *
  * Why a custom Expression (SURVEY §4.3 ladder, step b): the sorted-suffix
  * dedup ([[graft.ops.Dedup.suffixDupSpans]]) needs each suffix's LCP with
  * its sorted neighbor, once per corpus CHARACTER. SQL can only express LCP
  * as "count the k whose k-prefixes are equal" — a filter HOF over
  * sequence(1, depth) doing O(depth²) char compares with a fresh substring
  * allocation per probe (measured: the HOF version put x99 at 5.0 s at
  * sf0.1, ~2× the next-slowest registry query). The generated code below
  * walks the two byte arrays once — O(lcp) compares, zero allocation,
  * inside WholeStageCodegen.
  *
  * Char semantics match SQL `left(a, k) = left(b, k)` counting (and
  * DuckDB's replay of it): bytes are consumed one UTF-8 codepoint at a
  * time and a codepoint only counts if ALL its bytes match, so a
  * common byte prefix that ends mid-codepoint does not overcount (UTF-8
  * self-synchronization: differing lead bytes always differ byte-wise).
  */
case class LcpChars(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcp_chars"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcpChars =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    LcpChars.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      // one static call — no boxing, stays inside the codegen span
      s"${ev.value} = graft.plans.LcpChars.lcp($a, $b);")
}

object LcpChars {
  /** Characters in the longest common prefix of a and b. */
  def lcp(a: UTF8String, b: UTF8String): Int = {
    val n = math.min(a.numBytes(), b.numBytes())
    var i = 0
    var chars = 0
    var done = false
    while (!done && i < n) {
      val len = UTF8String.numBytesForFirstByte(a.getByte(i))
      if (i + len > n) done = true
      else {
        var k = 0
        while (k < len && a.getByte(i + k) == b.getByte(i + k)) k += 1
        if (k < len) done = true
        else { chars += 1; i += len }
      }
    }
    chars
  }
}
