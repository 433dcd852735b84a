package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

/** [[CrawlSchedule]] — slot assignment determinism, duplicate
  * collapse, delay defaulting, and the host report the arithmetic gate
  * (q_c35) only samples.
  */
class CrawlScheduleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("slots follow md5 order; dup urls burn one slot; default delay") {
    val urls = Seq("https://a.io/1", "https://a.io/2", "https://a.io/3")
    val frontier = (urls ++ Seq("https://a.io/2")) // dup
      .map(u => ("a.io", u)).toDF("host", "url")
    val delays = Seq(("b.io", Some(5L))).toDF("host", "delay") // a.io absent
    val got = CrawlSchedule
      .schedule(frontier, "host", "url", delays, "host", "delay",
        defaultDelaySec = 3)
      .orderBy("fetch_seq")
      .select("url", "delay_sec", "fetch_seq", "fetch_at_sec")
      .as[(String, Long, Int, Long)].collect().toSeq
    val expectedOrder = urls.sortBy(md5hex)
    assert(got.map(_._1) === expectedOrder)
    assert(got.map(_._3) === Seq(0, 1, 2))
    assert(got.map(r => (r._2, r._4)) === Seq((3L, 0L), (3L, 3L), (3L, 6L)))
  }

  test("null delay falls back to the default; hosts are independent") {
    val frontier = Seq(
      ("a.io", "u1"), ("a.io", "u2"),
      ("b.io", "v1"), ("b.io", "v2"), ("b.io", "v3"))
      .toDF("host", "url")
    val delays = Seq(("a.io", Some(7L)), ("b.io", None))
      .toDF("host", "delay")
    val got = CrawlSchedule
      .schedule(frontier, "host", "url", delays, "host", "delay",
        defaultDelaySec = 2)
      .orderBy("host", "fetch_seq")
      .select("host", "delay_sec", "fetch_at_sec")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a.io", 7L, 0L), ("a.io", 7L, 7L),
      ("b.io", 2L, 0L), ("b.io", 2L, 2L), ("b.io", 2L, 4L)))
  }

  test("host report: n_urls, delay, makespan = last slot offset") {
    val frontier = Seq(
      ("a.io", "u1"), ("a.io", "u2"), ("a.io", "u3"), ("b.io", "v1"))
      .toDF("host", "url")
    val delays = Seq(("a.io", 4L)).toDF("host", "delay")
    val sched = CrawlSchedule
      .schedule(frontier, "host", "url", delays, "host", "delay",
        defaultDelaySec = 1)
    val got = CrawlSchedule.hostReport(sched, "host")
      .orderBy("host")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a.io", 3L, 4L, 8L), ("b.io", 1L, 1L, 0L)))
  }
}
