package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate over (score double, id long) pairs,
  * ordered by (score DESC, id ASC). Returns
  * `array<struct<score:double, id:bigint>>` of the k best, best first.
  *
  * Why (SURVEY.md §2 roadmap in `SimilaritySearch.topKPerKey`): the
  * window-function top-k sorts every candidate row inside each partition.
  * As a `TypedImperativeAggregate` the prune happens MAP-SIDE in the hash
  * aggregate — each input row is an O(log k) heap update, partial buffers
  * of at most k entries shuffle, and no sort of the full candidate set
  * ever happens. At 100 TB that removes the dominant sort+shuffle of the
  * ANN ranking stage entirely.
  *
  * Tie-break matches the window/oracle form exactly: a row beats another
  * on higher score, then on smaller id.
  */
case class TopKScoreId(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKScoreId.Buffer] {

  import TopKScoreId._

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got " +
          s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")

  override def prettyName: String = "topk_score_id"

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // null and NaN scores are unrankable and excluded. NaN especially: every
    // comparison against it is false, so one admitted NaN at the heap root
    // would block all future admissions (poisoned buffer).
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = { b.absorb(other); b }

  override def eval(b: Buffer): Any = {
    val sorted = b.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(b: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = b.entries
    out.writeInt(entries.length)
    entries.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buffer(k)
    var j = 0
    while (j < n) { b.offer(in.readDouble(), in.readLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreId =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreId =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScoreId =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKScoreId {

  /** Bounded min-heap keeping the k best under (score desc, id asc); the
    * root is the WORST kept entry, evicted when something better arrives.
    */
  final class Buffer(k: Int) {
    // binary heap over parallel primitive arrays (no boxing)
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    /** a is worse than b under (score desc, id asc)? */
    @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    def offer(s: Double, i: Long): Unit =
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1
        var c = n - 1
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      var done = false
      while (!done) {
        val l = 2 * p + 1
        val r = l + 1
        var w = p // the worst of the trio bubbles up toward the root
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == p) done = true
        else { swap(p, w); p = w }
      }
    }

    def absorb(other: Buffer): Unit = {
      var j = 0
      while (j < other.n) { offer(other.scores(j), other.ids(j)); j += 1 }
    }

    def entries: Seq[(Double, Long)] =
      (0 until n).map(j => (scores(j), ids(j)))

    def sortedDesc: Seq[(Double, Long)] =
      entries.sortBy { case (s, i) => (-s, i) }
  }
}
