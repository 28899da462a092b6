package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen Morton (Z-order) key: interleaves the low 21 bits of two
  * non-negative LONG columns into one 42-bit key (a's bits land on even
  * positions, b's on odd). Range-partitioning and sorting files by this key
  * clusters BOTH dimensions at once, so parquet min/max (or any zone-map)
  * pruning works for predicates on either column — the standard data-layout
  * move for multi-dimension filters at 100 TB, where a single-column sort
  * ruins locality for the second column (cf. Delta/Iceberg Z-ORDER
  * clustering; this is the key function those writers apply).
  *
  * Contract: both inputs must be in [0, 2^21); anything else returns NULL
  * (clamping would silently co-locate out-of-range rows at the space's
  * edge — a NULL is loud at layout time, which is when you want it).
  * Integer-only math, so an external oracle replays the key exactly.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // out-of-range => NULL
  override def prettyName: String = "zorder_key"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (x < 0 || x >= ZOrderKey.Limit || y < 0 || y >= ZOrderKey.Limit) null
    else ZOrderKey.interleave(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      // NB: no leading "|" inside the generated Java — stripMargin would
      // eat a line-initial bitwise OR (it did; Janino then read the next
      // parenthesized shift as a cast: `Expression "2 * i" is not a type`)
      s"""
         |if ($a < 0L || $a >= ${ZOrderKey.Limit}L ||
         |    $b < 0L || $b >= ${ZOrderKey.Limit}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0L;
         |  for (int $i = 0; $i < ${ZOrderKey.Bits}; $i++) {
         |    ${ev.value} |= ((($a >>> $i) & 1L) << (2 * $i)) |
         |      ((($b >>> $i) & 1L) << (2 * $i + 1));
         |  }
         |}
       """.stripMargin
    })
}

object ZOrderKey {
  /** 21 bits per dimension: 42-bit keys stay well inside a LONG and cover
    * 2M distinct values per axis — bucket/quantize wider domains first. */
  val Bits = 21
  val Limit: Long = 1L << Bits

  def interleave(a: Long, b: Long): Long = {
    var r = 0L
    var i = 0
    while (i < Bits) {
      r |= ((a >>> i) & 1L) << (2 * i) | ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }
}
