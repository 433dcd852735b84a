package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("lastRowWins keeps the row with max order col per key (A3)") {
    import spark.implicits._
    val df = Seq(
      (1, 1, "first"), (1, 3, "last"), (1, 2, "mid"),
      (2, 7, "only")).toDF("k", "ord", "v")
    val out = Dedup.lastRowWins(df, Seq("k"), "ord").orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ===
      Seq((1, "last", 3), (2, "only", 7)))
  }

  test("lastRowWinsTotal is deterministic under non-unique order col") {
    import spark.implicits._
    val df = Seq(
      (1, 5, "b"), (1, 5, "a"), (1, 5, "c"),
      (2, 1, "x")).toDF("k", "ord", "v")
    val run1 = Dedup.lastRowWinsTotal(df.repartition(4), Seq("k"), Seq("ord")).orderBy("k").collect()
    val run2 = Dedup.lastRowWinsTotal(df.repartition(2), Seq("k"), Seq("ord")).orderBy("k").collect()
    assert(run1.toSeq === run2.toSeq)
    // ties broken by descending value columns → "c" wins
    assert(run1.head.getString(2) === "c")
  }

  test("keepFirstBy keeps min tie-breaker row per dedup group") {
    import spark.implicits._
    val df = Seq(
      ("dup", 30, "z"), ("dup", 10, "a"), ("dup", 20, "m"),
      ("solo", 5, "s")).toDF("text", "doc_id", "payload")
    val out = Dedup.keepFirstBy(df, Seq("text"), "doc_id").orderBy("doc_id").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq ===
      Seq(("solo", 5, "s"), ("dup", 10, "a")))
  }
}

class SyncDiffSpec extends SparkSpec {

  test("deletes = target keys absent from source (J4)") {
    import spark.implicits._
    val source = Seq("a", "b").toDF("k")
    val target = Seq("b", "c", "d").toDF("k")
    val plan = SyncDiff.plan(source, target, Seq("k"))
    assert(plan.deletes.collect().map(_.getString(0)).sorted.toSeq === Seq("c", "d"))
    assert(plan.upserts.count() === 2)
  }

  test("property: delete∩source=∅ and target ⊆ source∪deletes (key-space partition)") {
    import spark.implicits._
    val genSet = Gen.containerOf[Set, Int](Gen.choose(0, 30))
    (0 until 10).foreach { i =>
      val seed = Seed(i.toLong)
      val src = genSet.apply(Gen.Parameters.default, seed).getOrElse(Set.empty)
      val tgt = genSet.apply(Gen.Parameters.default, seed.next).getOrElse(Set.empty)
      val source = src.toSeq.toDF("k")
      val target = tgt.toSeq.toDF("k")
      val del = SyncDiff.plan(source, target, Seq("k")).deletes
        .collect().map(_.getInt(0)).toSet
      assert(del.intersect(src) === Set.empty, s"case $i")
      assert(tgt.subsetOf(src ++ del), s"case $i")
    }
  }

  test("applyCdc: update replaces, delete removes, insert appends, rest untouched") {
    import spark.implicits._
    val target = Seq(
      (1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0)).toDF("k", "name", "v")
    val changes = Seq(
      (2L, "two v2", 22.0, "U"), // update
      (3L, "ignored", 0.0, "D"), // delete (payload irrelevant)
      (9L, "nine", 90.0, "U")    // insert
    ).toDF("k", "name", "v", "op")
    val got = SyncDiff.applyCdc(target, changes, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got === Array((1L, "one", 10.0), (2L, "two v2", 22.0), (9L, "nine", 90.0)))
    // column order of the changes frame must not matter (select by name)
    val shuffled = changes.select("op", "v", "name", "k")
    val got2 = SyncDiff.applyCdc(target, shuffled, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got2 === got)
  }
}
