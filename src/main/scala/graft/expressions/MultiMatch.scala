package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975, CACM 18(6)
  * — the dictionary-matching classic): one left-to-right pass over the
  * text reports EVERY pattern that occurs, including overlapping matches
  * and patterns that are substrings of other patterns (suffix outputs
  * ride the failure links). Built once per pattern set; matching is
  * O(text + matches) regardless of how many patterns the dictionary
  * holds — the blocklist-filtering shape, where the naive per-pattern
  * `contains` scan is O(patterns × text).
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  // trie over UTF-16 chars: per-node transition map, failure link, and
  // the pattern ids terminating at (or reachable via suffix links from)
  // the node
  private val goto_ = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  private val out = mutable.ArrayBuffer(List.empty[Int])

  patterns.zipWithIndex.foreach { case (p, pid) =>
    var s = 0
    p.foreach { ch =>
      s = goto_(s).getOrElseUpdate(ch, {
        goto_ += mutable.HashMap.empty[Char, Int]
        fail += 0
        out += Nil
        goto_.length - 1
      })
    }
    out(s) = pid :: out(s)
  }
  locally { // BFS failure links; merge suffix outputs
    val queue = mutable.Queue.empty[Int]
    goto_(0).valuesIterator.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      goto_(u).foreach { case (ch, v) =>
        queue.enqueue(v)
        var f = fail(u)
        while (f != 0 && !goto_(f).contains(ch)) f = fail(f)
        fail(v) = if (goto_(f).contains(ch) && goto_(f)(ch) != v) goto_(f)(ch) else 0
        out(v) = out(v) ++ out(fail(v))
      }
    }
  }

  /** Distinct ids of every pattern occurring in `text`, ascending. */
  def matchIds(text: String): Array[Int] = {
    val hit = new java.util.BitSet(patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !goto_(s).contains(ch)) s = fail(s)
      s = goto_(s).getOrElse(ch, 0)
      var o = out(s)
      while (o.nonEmpty) { hit.set(o.head); o = o.tail }
      i += 1
    }
    val res = new Array[Int](hit.cardinality())
    var j = 0
    var b = hit.nextSetBit(0)
    while (b >= 0) { res(j) = b; j += 1; b = hit.nextSetBit(b + 1) }
    res
  }

  /** Occurrence count per pattern id (ALL occurrences, overlapping
    * included — every match end position reports), aligned to the pattern
    * array: result(i) = occurrences of patterns(i), 0 when absent.
    */
  def matchCounts(text: String): Array[Int] = {
    val cnt = new Array[Int](patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !goto_(s).contains(ch)) s = fail(s)
      s = goto_(s).getOrElse(ch, 0)
      var o = out(s)
      while (o.nonEmpty) { cnt(o.head) += 1; o = o.tail }
      i += 1
    }
    cnt
  }
}

/** `multi_match(text, array('p1', 'p2', …))` → array<int> of the ids
  * (0-based positions in the pattern array) of every pattern occurring in
  * the text, ascending; empty array when none, null on null text.
  *
  * Why a custom Expression (the [[JaroWinkler]] rationale): the automaton
  * state walk is inherently imperative, and the whole point is ONE text
  * pass for the entire dictionary — per-pattern `contains` columns would
  * rescan the text once per pattern. The automaton is analysis-time
  * state: built once from the (foldable) pattern array on the driver,
  * shipped to executors inside the codegen references array, and shared
  * by every row of the task.
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "multi_match"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.matchIds(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$acRef.matchIds($in.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

/** `multi_match_counts(text, array('p1', …))` → array<int> of occurrence
  * counts ALIGNED to the pattern array (counts(i) = occurrences of
  * pattern i, overlapping included, 0 when absent); null on null text.
  * The lexicon-scoring companion to [[MultiMatch]]: weighted dictionary
  * scores need per-pattern frequencies, still in one automaton pass.
  */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "multi_match_counts"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.matchCounts(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$acRef.matchCounts($in.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchCounts =
    copy(child = newChild)
}
