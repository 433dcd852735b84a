package graft.operators

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("known answers: pair support, lift, total tie-break order") {
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 2L), // duplicate item row dedups
      (30L, 2L), (30L, 3L),
      (40L, 1L), (40L, 2L)
    ).toDF("basket", "item")
    val got = Association.coOccurrenceTopK(baskets, "basket", "item", k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // supports: (1,2)=3, (2,3)=2, (1,3)=1; N=4, c1=3, c2=4, c3=2
    assert(got === Array(
      (1L, 2L, 3L, 3.0 * 4 / 3 / 4),
      (2L, 3L, 2L, 2.0 * 4 / 4 / 2),
      (1L, 3L, 1L, 1.0 * 4 / 3 / 2)))
  }

  test("k cuts before the lift joins; ties break on (p1, p2)") {
    // four pairs all with support 1 — the k=2 cut must take (1,2),(1,3)
    val baskets = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 3L),
      (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 4L)
    ).toDF("b", "i")
    val got = Association.coOccurrenceTopK(baskets, "b", "i", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Array((1L, 2L), (1L, 3L)))
  }

  test("itemCosineTopK: popularity-normalized ranking, minCount cut") {
    import spark.implicits._
    // items 1,2 co-occur twice but each appears 3 times → cos = 2/3;
    // items 3,4 co-occur twice and each appears EXACTLY twice → cos = 1.
    // Raw support ties the two pairs; cosine must rank (3,4) first.
    val baskets = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 9L), // 3rd appearance of item 1 away from item 2
      (6L, 2L), (6L, 9L), // 3rd appearance of item 2 away from item 1
      (4L, 3L), (4L, 4L),
      (5L, 3L), (5L, 4L)
    ).toDF("b", "i")
    val got = Association.itemCosineTopK(baskets, "b", "i", k = 10, minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.head === ((3L, 4L, 2L, 1.0)))
    val pair12 = got.find(t => t._1 == 1L && t._2 == 2L).get
    assert(pair12._3 === 2L)
    assert(math.abs(pair12._4 - 2.0 / 3.0) < 1e-12)
    // singleton pairs (1,9), (2,9) fell to the minCount cut
    assert(got.length === 2)
    // minCount filters singleton pairs entirely
    val single = Seq((1L, 7L), (1L, 8L)).toDF("b", "i")
    assert(Association.itemCosineTopK(single, "b", "i", k = 5, minCount = 2L)
      .count() === 0L)
  }
}
