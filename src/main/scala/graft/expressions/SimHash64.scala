package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit Charikar SimHash of an
  * `array<string>` token list in one pass.
  *
  * Why a custom Expression (the [[MinHashSignature]] rationale): the
  * composable HOF form ([[graft.functions.Hashing.simHashHof]]) folds a
  * 64-slot vote array with `aggregate` + `zip_with` — per TOKEN it
  * allocates a fresh 64-element array and dispatches a boxed lambda per
  * bit. This form hashes each token once (`XXH64.hashUTF8String`, seed 42
  * — identical to the `xxhash64` built-in) and updates 64 primitive vote
  * counters in a tight loop, inside whole-stage codegen. BENCH r02 put
  * the SimHash scan stage at the top of the suite (`q_d4b` 11.5 s,
  * `q_d4` 4.4 s at sf0.1).
  *
  * Value-identical to the HOF form in every case: same per-token hash
  * (null token hashes to the untouched seed 42, matching the built-in),
  * +1 vote for a set bit / −1 for a clear bit, result bit j set iff the
  * vote sum is strictly positive (ties → 0, as `when(v > 0, ...)` gives),
  * empty array → 0L, null array → SQL NULL (`aggregate` of a null array
  * is null). Spec-verified bit-exact against the HOF twin.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 42L else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
        |int[] $votes = new int[64];
        |int $n = $arr.numElements();
        |for (int $i = 0; $i < $n; $i++) {
        |  long $h = $arr.isNullAt($i)
        |    ? 42L
        |    : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        |        $arr.getUTF8String($i), 42L);
        |  for (int $j = 0; $j < 64; $j++) {
        |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
        |  }
        |}
        |${ev.value} = 0L;
        |for (int $j = 0; $j < 64; $j++) {
        |  if ($votes[$j] > 0) ${ev.value} |= (1L << $j);
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
