package graft.operators

import graft.SparkSpec

class PiiRedactionSpec extends SparkSpec {
  import spark.implicits._

  test("counts and rewrites each pattern class; order prevents double-counting") {
    val docs = Seq(
      (1L, "mail john.doe@example.com and jane@test.org now"),
      (2L, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
      (3L, "no pii here at all"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = PiiRedaction.redact(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)), r.getString(5)))
      .toMap
    assert(got(1L) === (((2, 0, 0, 0), "mail [EMAIL] and [EMAIL] now")))
    assert(got(2L) === (((0, 1, 1, 1), "ssn [SSN] phone [PHONE] ip [IP]")))
    assert(got(3L) === (((0, 0, 0, 0), "no pii here at all")))
    assert(got(4L) === (((0, 0, 0, 0), "")))
  }

  test("an SSN is consumed by its own placeholder, never re-counted as a phone") {
    val docs = Seq((1L, "id 987-65-4321 ok")).toDF("doc_id", "text")
    val r = PiiRedaction.redact(docs, "doc_id", "text").collect().head
    assert(r.getInt(2) === 1) // n_ssns
    assert(r.getInt(3) === 0) // n_phones must NOT see the 3-2-4 shape
    assert(r.getString(5) === "id [SSN] ok")
  }

  test("dotted phone vs IPv4: phone pass runs first and wins the 3-3-4 shape") {
    val docs = Seq((1L, "call 555.123.4567 or ping 192.168.0.1")).toDF("doc_id", "text")
    val r = PiiRedaction.redact(docs, "doc_id", "text").collect().head
    assert(r.getInt(3) === 1 && r.getInt(4) === 1)
    assert(r.getString(5) === "call [PHONE] or ping [IP]")
  }
}
