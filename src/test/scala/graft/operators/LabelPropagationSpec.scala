package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("barbell graph: two K3 communities survive 3 synchronous rounds") {
    // K3 {1,2,3} + K3 {4,5,6} bridged by 3–4; hand-iterated sync-LPA:
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4
    // r2: 1→1 2→1 3→1 4→4 5→3 6→3
    // r3: 1→1 2→1 3→1 4→3 5→3 6→3
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("s", "d")
    val got = LabelPropagation.run(edges, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("self-loops, duplicates, and reversed direction canonicalize away") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), // one real edge
      (3L, 3L)) //                               pure self-loop → node drops
      .toDF("s", "d")
    val got = LabelPropagation.run(edges, "s", "d", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 and 2 each have exactly one neighbor: r1 swaps labels, r2 swaps
    // back — synchronous LPA's classic 2-cycle, fixed rounds make it
    // deterministic; node 3 (self-loop only) has no edges and no row
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("star: leaves adopt the hub, hub adopts the smallest leaf") {
    val edges = (2L to 6L).map(i => (1L, i)).toDF("s", "d")
    val got = LabelPropagation.run(edges, "s", "d", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("majority_label single-aggregate ≡ classic two-aggregate form") {
    import org.apache.spark.sql.functions._
    // pseudo-random graph big enough to exercise map-side partials,
    // histogram growth, and cross-partition merges
    val edges = spark.range(0, 4000)
      .select(
        (pmod(col("id") * 2654435761L, lit(97L))).as("s"),
        (pmod(col("id") * 40503L + 17L, lit(97L))).as("d"))
      .filter(col("s") =!= col("d"))
    for (iters <- Seq(1, 3)) {
      val fused = LabelPropagation.run(edges, "s", "d", iterations = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the classic form, inline: join + count per (node,label) + argmax
      val canon = edges.filter(col("s") =!= col("d"))
        .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
        .distinct()
      val und = canon.select(col("a").as("node"), col("b").as("nbr"))
        .unionAll(canon.select(col("b").as("node"), col("a").as("nbr")))
      var labels = und.select(col("node")).distinct()
        .select(col("node"), col("node").as("label"))
      for (_ <- 1 to iters) {
        labels = und
          .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
          .groupBy(col("node"), col("label"))
          .agg(count(lit(1)).as("__c"))
          .groupBy(col("node"))
          .agg(max_by(col("label"),
            struct(col("__c"), (-col("label")).as("__neg"))).as("label"))
      }
      val classic = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fused === classic, s"vote drift at iterations=$iters")
    }
  }

  test("assumeCanonical skips the distinct but preserves the vote") {
    val raw = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("s", "d")
    val base = LabelPropagation.run(raw, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = LabelPropagation.run(raw, "s", "d", iterations = 3,
      assumeCanonical = true) // input already a<b, deduped, no loops
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === base)
  }
}
