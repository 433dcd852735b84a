package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k-by-hash SAMPLE SKETCH (the KMV/bottom-k scheme of
  * Cohen–Kaplan 2007): keep the k (hashKey, value) pairs with the
  * SMALLEST hash keys. Because the kept set is a pure function of the
  * input MULTISET — not of arrival or partition order — the sketch is
  * deterministic, commutative, and associative, unlike compaction
  * sketches (KLL coin flips, t-digest merge order), which is what makes
  * it oracle-replayable: any engine that ranks by the same hash
  * reproduces the sample bit-exactly, even far above capacity.
  *
  * The sample is a uniform (hash-) random subset, so quantiles/means
  * estimated from it carry the standard O(1/√k) sampling error —
  * [[graft.operators.QuantileSketch]] builds the quantile estimator on
  * top and the spec pins the error bound.
  *
  * Scale contract (the [[TopKScoreId]] rationale): each input row is an
  * O(log k) bounded-heap update MAP-SIDE in the hash aggregate; partial
  * buffers of ≤ k entries shuffle; no sort of the full group ever
  * happens. Returns `array<struct<hk:bigint, value:double>>` sorted by
  * (hk ASC, value ASC).
  */
case class BottomKSample(
    hashExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKSample.Buffer] {

  import BottomKSample._

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(hashExpr, valueExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hk", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType && valueExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, double), got " +
          s"(${hashExpr.dataType.simpleString}, ${valueExpr.dataType.simpleString})")

  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    // null pairs carry no value; NaN would poison heap comparisons
    if (h != null && v != null && !v.asInstanceOf[Double].isNaN)
      b.offer(h.asInstanceOf[Long], v.asInstanceOf[Double])
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = { b.absorb(other); b }

  override def eval(b: Buffer): Any =
    new GenericArrayData(b.sortedAsc.map { case (h, v) =>
      InternalRow(h, v)
    }.toArray[Any])

  override def serialize(b: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = b.entries
    out.writeInt(entries.length)
    entries.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buffer(k)
    var j = 0
    while (j < n) { b.offer(in.readLong(), in.readDouble()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(hashExpr = newChildren(0), valueExpr = newChildren(1))
}

object BottomKSample {

  /** Bounded max-heap keeping the k smallest under (hk asc, value asc);
    * the root is the LARGEST kept entry, evicted when something smaller
    * arrives.
    */
  final class Buffer(k: Int) {
    private val hks = new Array[Long](k)
    private val vals = new Array[Double](k)
    private var n = 0

    /** a is worse (larger) than b under (hk asc, value asc)? */
    @inline private def worse(ha: Long, va: Double, hb: Long, vb: Double): Boolean =
      ha > hb || (ha == hb && va > vb)

    def offer(h: Long, v: Double): Unit =
      if (n < k) {
        hks(n) = h; vals(n) = v; n += 1
        var c = n - 1
        while (c > 0 && worse(hks(c), vals(c), hks((c - 1) / 2), vals((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(hks(0), vals(0), h, v)) {
        hks(0) = h; vals(0) = v
        siftDown(0)
      }

    @inline private def swap(a: Int, b: Int): Unit = {
      val th = hks(a); hks(a) = hks(b); hks(b) = th
      val tv = vals(a); vals(a) = vals(b); vals(b) = tv
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      var done = false
      while (!done) {
        val l = 2 * p + 1
        val r = l + 1
        var w = p
        if (l < n && worse(hks(l), vals(l), hks(w), vals(w))) w = l
        if (r < n && worse(hks(r), vals(r), hks(w), vals(w))) w = r
        if (w == p) done = true
        else { swap(p, w); p = w }
      }
    }

    def absorb(other: Buffer): Unit = {
      var j = 0
      while (j < other.n) { offer(other.hks(j), other.vals(j)); j += 1 }
    }

    def entries: Seq[(Long, Double)] =
      (0 until n).map(j => (hks(j), vals(j)))

    def sortedAsc: Seq[(Long, Double)] =
      entries.sortBy(identity)
  }
}
