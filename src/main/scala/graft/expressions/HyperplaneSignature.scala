package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: the SRP-LSH bit signature of an
  * `array<float>` vector against `numPlanes` pseudo-random hyperplanes
  * packed into one BIGINT — bit p = sign(v · r_(planeOffset+p)).
  *
  * The [[FloatVectorDot]] rationale, × numPlanes: the HOF form
  * ([[graft.functions.Vectors.hyperplaneSignatureHof]]) re-walks the
  * vector per plane through interpreted lambda dispatch over a sliced
  * literal matrix. Here the plane matrix is one `double[][]` reference
  * and all numPlanes projections run as tight primitive loops inside
  * whole-stage codegen. On the banded pair miner
  * ([[graft.operators.SimilaritySearch.srpPairs]]) the signature pass is
  * numBands × bandBits projections per row — the scan-stage hot loop.
  *
  * Value-identical to the HOF form: same plane components (plan-time
  * [[graft.functions.Vectors.planeComponent]]), same left-to-right double
  * accumulation, dim > maxDim throws (the HOF's raise_error guard), a
  * null vector element nulls every projection → signature 0 (the HOF's
  * null-propagation through `when(proj > 0, …).otherwise(0)`).
  */
case class HyperplaneSignature(child: Expression, numPlanes: Int, planeOffset: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes <= 63, s"numPlanes must be in [1,63], got $numPlanes")

  import graft.functions.Vectors.maxDim

  // plan-time literal plane matrix, shipped once per task as a reference
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(numPlanes, maxDim)((p, i) =>
      graft.functions.Vectors.planeComponent(planeOffset + p, i))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_signature"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n > maxDim)
      throw new IllegalArgumentException(
        s"hyperplaneSignature supports dim <= $maxDim, got $n")
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return 0L; i += 1 }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      val pl = planes(p)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += arr.getFloat(j).toDouble * pl(j); j += 1 }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val pl = ctx.freshName("pl")
      val sig = ctx.freshName("sig")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $v.numElements();
         |if ($n > $maxDim) {
         |  throw new IllegalArgumentException(
         |    "hyperplaneSignature supports dim <= $maxDim, got " + $n);
         |}
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { $hasNull = true; break; }
         |}
         |long $sig = 0L;
         |if (!$hasNull) {
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    double[] $pl = $planesRef[$p];
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += (double) $v.getFloat($j) * $pl[$j];
         |    }
         |    if ($acc > 0) $sig |= (1L << $p);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}
