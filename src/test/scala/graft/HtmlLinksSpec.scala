package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** HtmlLinks (x93/x94 front end): real attribute parsing, decoy
  * immunity, and the closed-form five-anchor contract of the planted
  * page.
  */
class HtmlLinksSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def links(html: String): Seq[String] =
    Seq(Tuple1(html)).toDF("h")
      .select(GraftFunctions.htmlLinks(col("h")).as("l"))
      .collect()(0).getSeq[String](0)

  test("href values parse from real attributes: quoted, single-quoted, unquoted, any case") {
    assert(links("""<a href="/a">x</a>""") === Seq("/a"))
    assert(links("""<a href='/b'>x</a>""") === Seq("/b"))
    assert(links("""<a href=/c>x</a>""") === Seq("/c"))
    assert(links("""<A HREF="/d">x</A>""") === Seq("/d"))
    assert(links("""<a class="n" id='z' href = "/e" rel=nofollow>x</a>""") === Seq("/e"))
    // document order across multiple anchors
    assert(links("""<p><a href="/1">a</a> mid <a href="/2">b</a></p>""") === Seq("/1", "/2"))
  }

  test("decoys never contribute: script/style raw text, comments, non-anchor tags, bare text") {
    assert(links("""<script>var s = '<a href="/ghost">g</a>';</script>""") === Seq.empty)
    assert(links("""<style>a[href="/ghost"] { color: red }</style>""") === Seq.empty)
    assert(links("""<!-- <a href="/ghost">g</a> -->""") === Seq.empty)
    assert(links("""<link href="/style.css"><area href="/map">""") === Seq.empty)
    assert(links("""plain text href="/ghost" outside a tag""") === Seq.empty)
    // anchor without an href, or with an empty one, yields nothing
    assert(links("""<a name="top">x</a><a href="">y</a>""") === Seq.empty)
    // '>' inside a quoted attribute value does not close the tag
    assert(links("""<a title="1 > 0" href="/gt">x</a>""") === Seq("/gt"))
  }

  test("malformed markup is best-effort, never a throw") {
    // a tag truncated at end-of-input ends the parse WITHOUT emitting its
    // half-read href (same best-effort rule as HtmlExtract's scanner)
    assert(links("""<a href="/ok">fine</a><a href="/trunc""") === Seq("/ok"))
    assert(links("""<a href=""") === Seq.empty)
    assert(links("") === Seq.empty)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("h")
      .select(GraftFunctions.htmlLinks(col("h")).as("l")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("planted page yields exactly the five closed-form anchors, in order") {
    val got = Seq((29L, "some doc text")).toDF("id", "t")
      .select(GraftFunctions.htmlLinks(GraftFunctions.buildHtml(col("id"), col("t"))).as("l"))
      .collect()(0).getSeq[String](0)
    assert(got === Seq("/p/29", s"/q/${29 % 13}", "/ref/29", "/about", "/tos"))
  }

  test("x93 surface matches the closed form on the real corpus at two SFs") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val got = SparkEntry.queries("x93_html_links")(spark, s"/root/testdata/$sf").collect()
      assert(got.nonEmpty, sf)
      got.foreach { r =>
        val id = r.getLong(0)
        val expected = Seq(
          s"/p/$id", s"/q/${id % 13}", s"/ref/$id", "/about", "/tos")
        assert(r.getString(2) === expected(r.getInt(1)), sf)
      }
      assert(got.groupBy(_.getLong(0)).forall(_._2.length == 5), sf)
    }
  }
}
