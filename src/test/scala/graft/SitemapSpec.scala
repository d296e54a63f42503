package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.GraftFunctions

/** SitemapUrls (x102): XML-lite walk edge cases — required loc, CDATA
  * verbatim, entity decode, ppm priority parse, truncation, tag case.
  */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def entries(xml: String): Seq[(String, String, Option[String], Option[String], Option[Int])] =
    Seq(Tuple1(xml)).toDF("x")
      .select(GraftFunctions.sitemapUrls(col("x")).as("e"))
      .collect()(0).getSeq[Row](0)
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4))))

  test("urlset entry with all fields; integer-ppm priority") {
    assert(entries(
      "<urlset><url><loc>https://e.com/a</loc><lastmod>2024-01-02</lastmod>" +
        "<changefreq>daily</changefreq><priority>0.8</priority></url></urlset>") ===
      Seq(("url", "https://e.com/a", Some("2024-01-02"), Some("daily"), Some(800000))))
  }

  test("priority parse: integers, long fractions truncate, junk is NULL") {
    def ppm(p: String): Option[Int] =
      entries(s"<urlset><url><loc>x</loc><priority>$p</priority></url></urlset>").head._5
    assert(ppm("1") === Some(1000000))
    assert(ppm("1.0") === Some(1000000))
    assert(ppm("0.55") === Some(550000))
    assert(ppm("0.1234567") === Some(123456)) // 6 fractional digits kept
    assert(ppm(" 0.5 ") === Some(500000)) // trimmed
    assert(ppm("high") === None)
    assert(ppm("1.5e2") === None)
    assert(ppm(".5") === None) // no integer digits
  }

  test("loc is required: entries without one are skipped") {
    assert(entries("<urlset><url><lastmod>2024-01-01</lastmod></url>" +
      "<url><loc>keep</loc></url></urlset>") ===
      Seq(("url", "keep", None, None, None)))
    assert(entries("<urlset><url><loc>  </loc></url></urlset>") === Seq.empty)
  }

  test("CDATA is verbatim (no entity decode) and padding trims") {
    assert(entries("<urlset><url><loc> <![CDATA[a&amp;b]]> </loc></url></urlset>")
      .head._2 === "a&amp;b")
    assert(entries("<urlset><url><loc>a&amp;b&#33;</loc></url></urlset>")
      .head._2 === "a&b!")
  }

  test("sitemapindex entries carry kind 'sitemap'") {
    assert(entries("<sitemapindex><sitemap><loc>/s1.xml</loc></sitemap>" +
      "<sitemap><loc>/s2.xml</loc><lastmod>2024-06-01</lastmod></sitemap></sitemapindex>") ===
      Seq(("sitemap", "/s1.xml", None, None, None),
        ("sitemap", "/s2.xml", Some("2024-06-01"), None, None)))
  }

  test("XML is case-sensitive: <LOC> is not a loc") {
    assert(entries("<urlset><url><LOC>x</LOC></url></urlset>") === Seq.empty)
  }

  test("comments and PIs are skipped; fields outside an entry are ignored") {
    assert(entries("<?xml version=\"1.0\"?><!-- <url><loc>ghost</loc></url> -->" +
      "<loc>stray</loc><urlset><url><loc>real</loc></url></urlset>")
      .map(_._2) === Seq("real"))
  }

  test("truncation is best-effort, never a throw") {
    assert(entries("<urlset><url><loc>https://e.com/a") === Seq.empty)
    assert(entries("<urlset><url><loc>done</loc></url><url><loc>cut") ===
      Seq(("url", "done", None, None, None)))
    assert(entries("<urlset><url><loc><![CDATA[unclosed") === Seq.empty)
    assert(entries("") === Seq.empty)
  }

  test("self-closing optional fields stay NULL") {
    assert(entries("<urlset><url><loc>x</loc><lastmod/></url></urlset>") ===
      Seq(("url", "x", None, None, None)))
  }

  test("null in, null out") {
    val out = Seq(Tuple1(null: String)).toDF("x")
      .select(GraftFunctions.sitemapUrls(col("x")).as("e")).collect()
    assert(out(0).isNullAt(0))
  }

  test("fixture branches: index for id%4=0, urlset otherwise, omission at id%3=0") {
    val idx = entries(new String(
      Seq(Tuple1(12L)).toDF("i")
        .select(GraftFunctions.buildSitemap(col("i"))).as[String].collect()(0)))
    assert(idx.map(_._1) === Seq("sitemap", "sitemap"))
    val omit = Seq(Tuple1(27L)).toDF("i")
      .select(GraftFunctions.sitemapUrls(GraftFunctions.buildSitemap(col("i"))).as("e"))
      .collect()(0).getSeq[Row](0)
    assert(omit.length === 3)
    assert(omit(0).isNullAt(2) && omit(0).isNullAt(3) && omit(0).isNullAt(4)) // id%3=0
    assert(omit(1).getInt(4) === 500000)
  }
}
