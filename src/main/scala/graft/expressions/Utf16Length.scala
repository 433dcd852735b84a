package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of a string in UTF-16 CODE UNITS — `String.length()` semantics
  * without materializing the String: supplementary-plane code points
  * (4-byte UTF-8 sequences) count 2, everything else 1.
  *
  * Exists because [[graft.plans.OptimizeJaroWinklerThreshold]]'s
  * length-ratio guard must measure in the SAME units as the
  * [[JaroWinkler]] kernel it protects (the kernel iterates UTF-16
  * chars). Spark's `Length` counts code points, which undercounts
  * supplementary-plane strings by up to 2× — enough to make a provably
  * sound bound unsound (a guard computed in code points can reject a
  * pair whose UTF-16 similarity clears the threshold). Walking the
  * UTF-8 lead bytes directly is both exact and allocation-free.
  */
case class Utf16Length(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "utf16_length"

  override def nullSafeEval(v: Any): Any =
    Utf16Length.utf16Length(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Utf16Length.utf16Length($c)")

  override protected def withNewChildInternal(newChild: Expression): Utf16Length =
    copy(child = newChild)
}

object Utf16Length {

  /** Static kernel shared by interpreted eval and generated code: one
    * pass over the UTF-8 lead bytes, no String allocation. Assumes valid
    * UTF-8 (the same contract as `UTF8String.numChars`).
    */
  def utf16Length(s: UTF8String): Int = {
    val nb = s.numBytes
    var i = 0
    var n = 0
    while (i < nb) {
      val b = s.getByte(i) & 0xff
      val w =
        if (b < 0x80) 1
        else if (b < 0xe0) 2
        else if (b < 0xf0) 3
        else 4
      n += (if (w == 4) 2 else 1)
      i += w
    }
    n
  }
}
