package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelChunkingSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel counts stages in strict order") {
    import spark.implicits._
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2: clicks BEFORE viewing — stage 2 not reached
      (2L, "click", ts(5)), (2L, "view", ts(10)),
      // user 3: view then click, purchase exactly AT the click time
      // (strictly-after rule: not reached)
      (3L, "view", ts(1)), (3L, "click", ts(2)), (3L, "purchase", ts(2)),
      // user 4: never viewed
      (4L, "click", ts(1)), (4L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel
      .funnelCounts(events, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    assert(got === Map(
      "stage1_view" -> 3, "stage2_click" -> 2, "stage3_purchase" -> 1))
  }

  test("chunking covers the text with the given overlap and keeps provenance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"), // 10 chars
      (2L, ""),           // empty → single empty chunk
      (3L, null.asInstanceOf[String]),
      (4L, "abc")
    ).toDF("doc_id", "text")
    val got = Chunking.chunkWithOverlap(docs, "doc_id", "text", size = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (1L, 0, "abcd"), (1L, 1, "defg"), (1L, 2, "ghij"), (1L, 3, "j"),
      (2L, 0, ""),
      (3L, 0, ""),
      (4L, 0, "abc")))
    // reconstruction: stride-spaced prefixes of each chunk re-concatenate
    // to the original text (no gaps, no reordering)
    val rebuilt = got.filter(_._1 == 1L).map(_._3.take(3)).mkString
    assert(rebuilt.startsWith("abcdefghij".take(9)))
  }
}
