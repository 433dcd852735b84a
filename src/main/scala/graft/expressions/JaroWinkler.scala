package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity of two strings
  * (Jaro 1989; Winkler 1990 — THE name-matching similarity of the
  * record-linkage literature, the graded companion to the edit-distance
  * blocking in [[graft.operators.FuzzyJoin]]).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` so the oracle
  * compares values directly (probed, not assumed):
  *  - either side empty → 0 (including both empty);
  *  - match window = max(0, max(len1, len2)/2 − 1), integer division;
  *  - transpositions = matched-sequence mismatches / 2 with INTEGER
  *    division (the original strcmp95 floor — an odd mismatch count
  *    does not contribute a half);
  *  - Winkler prefix boost j + ℓ·0.1·(1−j) with ℓ = common prefix
  *    capped at 4, applied only when jaro > 0.7.
  * Comparison is per UTF-16 char — identical to byte semantics on
  * ASCII, the name-field domain this serves.
  *
  * Why a custom Expression (the [[SimHash64]] rationale): the dynamic-
  * programming loop cannot be expressed in scan-side HOFs without a
  * per-row lambda tower; as a native expression it is one static call
  * inside whole-stage codegen, null-safe, and allocation-bounded by the
  * two match bitmaps.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler.similarity(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val cap = math.min(4, math.min(s1.length, s2.length))
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transpositions = mismatches / 2 with INTEGER division — the
    // original strcmp95 (and rapidfuzz/DuckDB) semantics; an odd
    // mismatch count floors, it does not contribute a half
    (md / l1 + md / l2 + (md - (t / 2)) / md) / 3.0
  }
}
