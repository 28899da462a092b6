package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: Σ min(w_a, w_b) over the id-intersection of
  * two SORTED ARRAY<BIGINT> id columns with aligned ARRAY<BIGINT> weight
  * columns — the weighted-Jaccard numerator (Ioffe 2010's exact verify
  * term, x238) evaluated by merge in one pass, with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §4.3 ladder, step b — same argument as
  * [[SortedArrayIntersectSize]]): the alternative is exploding each
  * candidate pair back to token-level rows and shuffling them through a
  * count/min aggregate — |cand|·|doc| rows of shuffle for what is a
  * row-local 2-pointer merge once the per-doc term vector is an array.
  * Built-in higher-order functions can't merge two sorted arrays in one
  * pass (zip_with aligns by POSITION, not key), and a UDF boxes every
  * element.
  *
  * Contract: ids1/ids2 sorted ascending and duplicate-free per row (they
  * are dense per-token ids from a distinct-join); ws1/ws2 positionally
  * aligned with their id arrays. Null in any argument → null.
  */
case class SortedWeightedIntersectMin(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four ARRAY<BIGINT> arguments, got " +
        children.map(_.dataType.sql).mkString(", "))
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_weighted_intersect_min"

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression)
      : SortedWeightedIntersectMin =
    copy(first = f, second = s, third = t, fourth = q)

  override def nullSafeEval(a: Any, wa: Any, b: Any, wb: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val xw = wa.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val yw = wb.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0; var j = 0; var s = 0L
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) {
        s += math.min(xw.getLong(i), yw.getLong(j)); i += 1; j += 1
      } else if (xv < yv) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, wa, b, wb) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val w1 = ctx.freshName("w1"); val w2 = ctx.freshName("w2")
      s"""
         |int $i = 0; int $j = 0;
         |final int $nx = $a.numElements(); final int $ny = $b.numElements();
         |${ev.value} = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i); final long $yv = $b.getLong($j);
         |  if ($xv == $yv) {
         |    final long $w1 = $wa.getLong($i); final long $w2 = $wb.getLong($j);
         |    ${ev.value} += ($w1 < $w2) ? $w1 : $w2;
         |    $i++; $j++;
         |  }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })
}
