package graft.operators

import graft.SparkSpec

class KCenterSpec extends SparkSpec {

  private def centers(pts: Seq[(Long, Seq[Float])], k: Int) = {
    val s = spark
    import s.implicits._
    KCenter.greedyCenters(pts.toDF("id", "v"), "id", "v", k)
      .orderBy("center_rank").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
  }

  test("farthest-point traversal on a line: 0, then 10, then 4") {
    val pts = Seq(0L -> Seq(0f), 1L -> Seq(4f), 2L -> Seq(10f))
    val out = centers(pts, 3)
    assert(out(0) == ((1, 0L, None)))
    assert(out(1) == ((2, 2L, Some(100.0)))) // farthest from 0
    // point 4: min(16, 36) = 16
    assert(out(2) == ((3, 1L, Some(16.0))))
  }

  test("selection radii are non-increasing (the greedy invariant)") {
    val pts = (0L until 40L).map(i =>
      i -> Seq((i * 37 % 23).toFloat, (i * 11 % 19).toFloat, (i % 7).toFloat))
    val ds = centers(pts, 8).flatMap(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.toSeq.toString)
  }

  test("distance ties break on the smaller id") {
    // two points equidistant from the first center
    val pts = Seq(0L -> Seq(0f), 5L -> Seq(3f), 3L -> Seq(-3f))
    val out = centers(pts, 2)
    assert(out(1)._2 == 3L) // both at dist2 9; id 3 < id 5
  }

  test("matches a driver-side reference traversal") {
    val pts = (0L until 60L).map { i =>
      i -> Seq.tabulate(8)(d => math.sin(i * 1.7 + d * 0.9).toFloat)
    }
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      BigDecimal(a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var chosen = List(0L)
    var dist = pts.map { case (i, v) => i -> d2(v, pts(0)._2) }.toMap
    val ref = scala.collection.mutable.ListBuffer[(Long, Double)]()
    (2 to 6).foreach { _ =>
      val (bid, bd) = dist.toSeq.sortBy { case (i, d) => (-d, i) }.head
      ref += ((bid, bd))
      chosen ::= bid
      val bv = pts(bid.toInt)._2
      dist = dist.map { case (i, d) =>
        i -> math.min(d, d2(pts(i.toInt)._2, bv)) }
    }
    val out = centers(pts, 6)
    assert(out.head == ((1, 0L, None)))
    out.tail.zip(ref).foreach { case ((_, id, d), (rid, rd)) =>
      assert(id == rid && d.contains(rd), s"$id vs $rid")
    }
  }

  test("partition count does not move the trajectory") {
    val s = spark
    import s.implicits._
    val pts = (0L until 50L).map(i =>
      i -> Seq.tabulate(4)(d => ((i * 13 + d * 5) % 17).toFloat))
    val df = pts.toDF("id", "v")
    val a = KCenter.greedyCenters(df.repartition(1), "id", "v", 5)
      .orderBy("center_rank").collect().map(_.toSeq).toSeq
    val b = KCenter.greedyCenters(df.repartition(16), "id", "v", 5)
      .orderBy("center_rank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
