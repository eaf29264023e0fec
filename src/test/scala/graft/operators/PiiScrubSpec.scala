package graft.operators

import graft.SparkSpec

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  test("each category redacts and counts on hand-built fixtures") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@sub.example.co.uk today"),
      (2L, "ssn 123-45-6789 and phone 555-867-5309"),
      (3L, "server at 192.168.0.1 and 10.0.0.255"),
      (4L, "clean text with no identifiers at all"),
      (5L, "a@b.io b@c.org two emails")
    ).toDF("doc_id", "text")
    val out = PiiScrub.scrub(docs, "text").orderBy("doc_id").collect()

    def r(i: Int) = out(i)
    // (doc_id, text, n_email, n_ssn, n_phone, n_ipv4, text_scrubbed)
    assert(r(0).getLong(2) == 1 &&
      r(0).getString(6) == "mail me at <EMAIL> today")
    assert(r(1).getLong(3) == 1 && r(1).getLong(4) == 1 &&
      r(1).getString(6) == "ssn <SSN> and phone <PHONE>")
    assert(r(2).getLong(5) == 2 &&
      r(2).getString(6) == "server at <IP> and <IP>")
    assert(r(3).getString(6) == r(3).getString(1)) // untouched
    assert(r(4).getLong(2) == 2 &&
      r(4).getString(6) == "<EMAIL> <EMAIL> two emails")
  }

  test("rule order: IP-shaped digits inside an email are not double-counted") {
    val docs = Seq((1L, "contact 10.0.0.1@host.example.com now")).toDF("doc_id", "text")
    val row = PiiScrub.scrub(docs, "text").collect()(0)
    assert(row.getLong(2) == 1)            // one email...
    assert(row.getLong(5) == 0)            // ...and NOT also an IP
    assert(row.getString(6) == "contact <EMAIL> now")
  }

  test("word boundaries: digit runs embedded in longer tokens do not match") {
    val docs = Seq((1L, "version v123-45-6789x is not an ssn")).toDF("doc_id", "text")
    val row = PiiScrub.scrub(docs, "text").collect()(0)
    assert(row.getLong(3) == 0 && row.getString(6).contains("v123-45-6789x"))
  }

  test("corpus summary aggregates totals and affected-row count") {
    val docs = Seq(
      (1L, "a@b.io and 1.2.3.4"),
      (2L, "nothing here"),
      (3L, "x@y.dev")
    ).toDF("doc_id", "text")
    val s = PiiScrub.summary(docs, "text").collect()(0)
    assert(s.getLong(s.fieldIndex("total_email")) == 2)
    assert(s.getLong(s.fieldIndex("total_ipv4")) == 1)
    assert(s.getLong(s.fieldIndex("rows_with_pii")) == 2)
    assert(s.getLong(s.fieldIndex("rows_total")) == 3)
  }
}
