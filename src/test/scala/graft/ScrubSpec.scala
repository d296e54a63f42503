package graft

import graft.operators.Scrub

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("redacts emails, urls, and phone runs with typed markers") {
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or https://example.com/a_b/c please"),
      (2L, "call +1 555 123 4567 now"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Scrub.withPiiRedaction(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(out(1L) === ((1L, 1L, 0L, "reach me at <EMAIL> or <URL> please")))
    assert(out(2L) === ((0L, 0L, 1L, "call <PHONE> now")))
    assert(out(3L) === ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("phone match does not swallow an unrelated trailing single digit") {
    val docs = Seq(
      (1L, "wait +12 345 6789 5 minutes"),
      (2L, "ref +123 only"), // short lone run: not a phone
      (3L, "raw +15551234567 contiguous")
    ).toDF("doc_id", "text")
    val out = Scrub.withPiiRedaction(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) === ((1L, "wait <PHONE> 5 minutes")))
    assert(out(2L) === ((0L, "ref +123 only")))
    assert(out(3L) === ((1L, "raw <PHONE> contiguous")))
  }

  test("counts agree with inserted markers when classes co-occur") {
    val docs = Seq(
      (1L, "a@b.co then http://x.y/z and a@b.co again +12 345 6789 end")
    ).toDF("doc_id", "text")
    val r = Scrub.withPiiRedaction(docs).collect()(0)
    val red = r.getString(5)
    assert(r.getLong(2) === 2L) // emails
    assert(r.getLong(3) === 1L) // urls
    assert(r.getLong(4) === 1L) // phones
    assert("<EMAIL>".r.findAllIn(red).length === 2)
    assert(red === "<EMAIL> then <URL> and <EMAIL> again <PHONE> end")
  }
}
