package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: |A ∩ B| of two SORTED ARRAY<BIGINT> columns by
  * merge-count, with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §4.3 ladder, step b): the pairwise-jaccard
  * hot loop over shingle-hash arrays is allocation-bound in both built-in
  * `array_intersect` (builds a hash set per row) and a Scala UDF (boxes every
  * element crossing the UDF boundary — measured 7× slower than the built-in
  * at sf0.1). The generated code below reads primitive longs straight out of
  * `ArrayData` — no allocation, no boxing, stays inside WholeStageCodegen.
  *
  * Inputs MUST be sorted ascending (see Dedup.charShingleHashes /
  * wordShingleUdf which emit sorted arrays); duplicates are counted once on
  * each side, matching set-intersection semantics for distinct inputs.
  */
case class SortedArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectSize =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0;
         |final int $nx = $a.numElements(); final int $ny = $b.numElements();
         |${ev.value} = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i); final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })
}

/** Function registration — both paths:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - runtime: `GraftFunctions.register(spark)` (idempotent)
  */
object GraftFunctions {
  val name = "sorted_intersect_size"

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (name, classOf[SortedArrayIntersectSize].getName,
      (c: Seq[Expression]) => SortedArrayIntersectSize(c(0), c(1))),
    ("float_dot", classOf[FloatDotProduct].getName,
      (c: Seq[Expression]) => FloatDotProduct(c(0), c(1))),
    ("nfc_normalize", classOf[UnicodeNormalize].getName,
      (c: Seq[Expression]) => UnicodeNormalize(c(0), "NFC")),
    ("nfkc_normalize", classOf[UnicodeNormalize].getName,
      (c: Seq[Expression]) => UnicodeNormalize(c(0), "NFKC")),
    ("repair_mojibake", classOf[RepairMojibake].getName,
      (c: Seq[Expression]) => RepairMojibake(c(0))),
    ("zorder_key", classOf[ZOrderKey].getName,
      (c: Seq[Expression]) => ZOrderKey(c(0), c(1))),
    ("lcp_chars", classOf[LcpChars].getName,
      (c: Seq[Expression]) => LcpChars(c(0), c(1))),
    ("rolling_fingerprint", classOf[RollingFingerprint].getName,
      (c: Seq[Expression]) => RollingFingerprint(c(0))),
    ("sorted_weighted_intersect_min",
      classOf[SortedWeightedIntersectMin].getName,
      (c: Seq[Expression]) =>
        SortedWeightedIntersectMin(c(0), c(1), c(2), c(3))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (n, cls, builder) =>
      // registerFunction REPLACES and warns on every repeat call (the bench
      // loop calls register once per query plan build) — skip when the name
      // already resolves so the log stays clean and registration is truly
      // idempotent. The skip VERIFIES the existing registration is ours:
      // silently riding a same-named foreign function (an earlier session
      // registration, or a future Spark builtin claiming the name) would
      // run the wrong implementation with no signal (round-12 ADVICE).
      val id = FunctionIdentifier(n)
      spark.sessionState.functionRegistry.lookupFunction(id) match {
        case Some(info) if info.getClassName == cls => () // ours already
        case Some(info) =>
          throw new IllegalStateException(
            s"function '$n' is already registered as ${info.getClassName}, " +
              s"expected $cls — a name collision would silently run the " +
              "wrong implementation")
        case None =>
          spark.sessionState.functionRegistry.registerFunction(
            id, new ExpressionInfo(cls, n), builder)
      }
    }

  private[plans] def all = functions
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (n, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(n), new ExpressionInfo(cls, n), builder))
    }
}
