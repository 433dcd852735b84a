package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TrapDetect]] — template normalization (hex before digits),
  * concentration arithmetic, the min-size guard, and dedup the
  * arithmetic gate (q_c38) only samples.
  */
class TrapDetectSpec extends SparkSpec {
  import spark.implicits._

  test("template: hex runs collapse before digit runs") {
    val got = Seq(
      "/cal/2024/07/15",
      "/sess/deadbeef00112233/page",
      "/a1b2/x", // short mixed run: digits collapse individually
      "/plain")
      .toDF("p")
      .select(TrapDetect.template(col("p")).as("t"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "/cal/N/N/N", "/sess/H/page", "/aNbN/x", "/plain"))
  }

  test("concentrated host flags; diverse and small hosts do not") {
    val trap = (0 until 40).map(i => ("t.io", s"https://t.io/cal/2024/$i"))
    val diverse = (0 until 40).map { i =>
      val p = i % 4 match {
        case 0 => "/about"
        case 1 => s"/p/$i"
        case 2 => s"/tag/$i/x$i"
        case _ => s"/u-$i"
      }
      ("d.io", s"https://d.io$p")
    }
    val small = (0 until 5).map(i => ("s.io", s"https://s.io/cal/2024/$i"))
    val got = TrapDetect.report(
      (trap ++ diverse ++ small).toDF("host", "url"),
      "host", "url", minUrls = 10, thresholdPct = 50)
      .orderBy("host")
      .select("host", "n_urls", "n_templates", "is_trap")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      // 10 "/about" rows collapse to ONE distinct url: 31 urls
      ("d.io", 31L, 4L, false),
      ("s.io", 5L, 1L, false), // concentrated but under minUrls
      ("t.io", 40L, 1L, true)))
  }

  test("duplicate frontier urls are not evidence") {
    val dup = (0 until 12).map(_ => ("x.io", "https://x.io/cal/2024/1")) ++
      Seq(("x.io", "https://x.io/about"))
    val got = TrapDetect.report(dup.toDF("host", "url"),
      "host", "url", minUrls = 2, thresholdPct = 60)
      .select("n_urls", "is_trap").as[(Long, Boolean)].collect().head
    // 12 dups collapse to ONE url: top share is 1/2, under 60%
    assert(got === ((2L, false)))
  }

  test("exact threshold boundary: top*100 == n*pct flags") {
    val rows = (0 until 5).map(i => ("b.io", s"https://b.io/cal/2024/$i")) ++
      (0 until 5).map(i => ("b.io", s"https://b.io/w${('a' + i).toChar}/x"))
    val got = TrapDetect.report(rows.toDF("host", "url"),
      "host", "url", minUrls = 5, thresholdPct = 50)
      .select("top_count", "n_urls", "is_trap")
      .as[(Long, Long, Boolean)].collect().head
    assert(got === ((5L, 10L, true))) // 5*100 >= 10*50 exactly
  }
}
