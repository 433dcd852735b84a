package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in double, strictly left to right.
  *
  * Why a custom Expression (SURVEY.md §7.2 — the one place built-ins lose):
  * the composable form `aggregate(zip_with(a, b, _*_), 0d, _+_)` evaluates
  * higher-order functions interpretively (CodegenFallback: per-row lambda
  * dispatch plus an allocated intermediate array). This expression
  * generates a tight primitive loop via `doGenCode`, participates in
  * whole-stage codegen, and allocates nothing — on the all-pairs cosine
  * workload that is the difference between the join stage being
  * compute-bound on lambda dispatch and being memory-bandwidth-bound.
  *
  * Numerics are IDENTICAL to the HOF form and to the DuckDB oracle's
  * `list_sum(list_transform(...))`: same element order, same double
  * accumulation — bit-exact across all three, which the oracle checks.
  *
  * Unequal lengths take the common prefix (embeddings are fixed-dim; the
  * HOF form zip-pads with nulls which `+` then propagates — a degenerate
  * case no caller relies on). Null ELEMENTS read as 0.0 rather than
  * propagating null, also irrelevant for dense embeddings.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // (ExpectsInputTypes is unusable outside org.apache.spark.sql —
  // AbstractDataType is private[sql] — so the check is hand-rolled.)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}
