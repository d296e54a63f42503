package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** HTML → text extraction: real markup walk, link-density boilerplate
  * filter, entity decoding, and the malformed/truncated-markup contract
  * (best-effort parse, NULL only for null input).
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, threshold: Double = 0.5): Row = {
    GraftFunctions.register(spark)
    Seq(Tuple1(html)).toDF("h")
      .select(GraftFunctions.htmlExtract(col("h"), lit(threshold)).as("x"))
      .select(col("x.full_text"), col("x.main_text"), col("x.n_blocks"), col("x.n_dropped"))
      .collect()(0)
  }

  private def fixture(id: Long, text: String): String = {
    GraftFunctions.register(spark)
    Seq((id, text)).toDF("id", "t")
      .select(GraftFunctions.buildHtml(col("id"), col("t")).as("h"))
      .collect()(0).getString(0)
  }

  test("fixture roundtrip: planted blocks, densities, and the 0.5 cut") {
    val r = extract(fixture(42L, "alpha beta gamma"))
    assert(r.getString(0) ===
      "nav item 42 more links here Heading 42! alpha beta gamma see ref 42 about & terms")
    assert(r.getString(1) === "Heading 42! alpha beta gamma see ref 42")
    assert(r.getInt(2) === 5 && r.getInt(3) === 3)
  }

  test("escaping roundtrips: specials in the document survive &amp;/&lt;/&gt;") {
    val r = extract(fixture(7L, "a < b & b > c"))
    // the escaped text decodes back verbatim — and the '<' inside it did
    // NOT open a tag
    assert(r.getString(1) === "Heading 7! a < b & b > c see ref 7")
  }

  test("script/style/comment/head content never leaks, even when it contains markup") {
    val html = """<html><head><title>T</title>
      |<script>if (a<b) { s = "<p>decoy</p>"; }</script>
      |<style>p { color: red } /* <p>x</p> */</style></head>
      |<body><!-- <p>ghost</p> --><p>real text</p></body></html>""".stripMargin
    val r = extract(html)
    assert(r.getString(0) === "real text")
    assert(r.getInt(2) === 1 && r.getInt(3) === 0)
  }

  test("inline tags do not split blocks; block tags do; br splits") {
    assert(extract("<p>a <b>b</b> <span>c</span></p>").getString(0) === "a b c")
    val r = extract("<div>one</div><div>two</div>")
    assert(r.getString(0) === "one two" && r.getInt(2) === 2)
    assert(extract("<p>x<br>y</p>").getInt(2) === 2)
  }

  test("link density is per block, strict at the threshold") {
    // 'abcde fghij' with 'abcde' linked: 11 chars, 6 link (space inherits
    // the following non-link char? no — space FOLLOWS the anchor close,
    // precedes 'f' (non-link) → 5 link / 11 = 0.4545 < 0.5 kept
    val kept = extract("""<p><a href="x">abcde</a> fghij</p>""")
    assert(kept.getString(1) === "abcde fghij")
    // fully-linked block measures exactly 1.0 (anchor-internal spaces
    // count as link mass) and is dropped at any threshold <= 1
    val dropped = extract("""<li><a href="x">two words</a></li>""", 1.0)
    assert(dropped.getString(0) === "two words" && dropped.getString(1) === "")
    // exactly-at-threshold is dropped (strict <): 'ab' linked of 'ab cd'
    // → space inherits 'c' (non-link) → 2/5 = 0.4; at threshold 0.4 drop
    val at = extract("""<p><a>ab</a> cd</p>""", 0.4)
    assert(at.getString(1) === "")
  }

  test("entities: named, decimal, hex, nbsp-as-space, unknown/unterminated literal") {
    assert(extract("<p>a&#33;&#x21; &quot;q&quot; &apos;s&apos;</p>").getString(0) ===
      "a!! \"q\" 's'")
    assert(extract("<p>a&nbsp;&nbsp;b</p>").getString(0) === "a b")
    assert(extract("<p>AT&T and &unknown; and &broken</p>").getString(0) ===
      "AT&T and &unknown; and &broken")
  }

  test("malformed markup is best-effort, never a throw") {
    // truncated mid-tag: text before the tag survives
    assert(extract("<p>kept text<a href=\"trunca").getString(0) === "kept text")
    // unclosed script swallows the remainder (raw-text rule)
    assert(extract("<p>before</p><script>var x = 1;").getString(0) === "before")
    // unclosed comment swallows the remainder (HTML5 eof-in-comment)
    assert(extract("<p>seen</p><!-- never closed <p>gone</p>").getString(0) === "seen")
    // '>' inside a quoted attribute does not close the tag
    assert(extract("""<p><a href="x>y" title='a>b'>t</a> rest</p>""").getString(0) === "t rest")
    // bare '<' in text is literal (HTML5 recovery); '</>' is ignored
    assert(extract("<p>1 < 2 and</> done</p>").getString(0) === "1 < 2 and done")
    // missing </head> heals at <body>
    assert(extract("<head><title>gone</title><body><p>visible</p>").getString(0) === "visible")
    // uppercase tags and attributes
    assert(extract("<P CLASS=\"x\">Up</P>").getString(0) === "Up")
  }

  test("empty/visible-less pages yield empty strings and zero counts, not NULL") {
    val r = extract("<html><head><title>t</title></head><body></body></html>")
    assert(r.getString(0) === "" && r.getString(1) === "")
    assert(r.getInt(2) === 0 && r.getInt(3) === 0)
    val e = extract("")
    assert(e.getString(0) === "" && e.getInt(2) === 0)
    // null input → null struct
    GraftFunctions.register(spark)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("h")
      .select(GraftFunctions.htmlExtract(col("h"), lit(0.5)).as("x"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("short/empty document text drops the content block (density >= 0.5)") {
    GraftFunctions.register(spark)
    // block 4 = "{norm(t)} see ref {id}", link chars = len("ref {id}")+1
    // (the space before the anchor inherits link-ness), so strict <0.5
    // keeps iff len(norm(t)) > 1 + len(id-digits) — the x90 oracle's
    // keep4 closed form. id=7 → keep iff len(t) > 2.
    def run(id: Long, t: String): Row =
      Seq((id, t)).toDF("id", "t")
        .select(GraftFunctions
          .htmlExtract(GraftFunctions.buildHtml(col("id"), col("t")), lit(0.5)).as("x"))
        .select(col("x.*")).collect()(0)
    val empty = run(7L, "")
    assert(empty.getString(0) === "nav item 7 more links here Heading 7! see ref 7 about & terms")
    assert(empty.getString(1) === "Heading 7!")
    assert(empty.getInt(2) === 5 && empty.getInt(3) === 4)
    val short = run(7L, "ab") // len 2 = 1 + len("7") + ... not > 2 → dropped
    assert(short.getString(1) === "Heading 7!" && short.getInt(3) === 4)
    val edge = run(7L, "abc") // len 3 > 2 → kept, density just under 0.5
    assert(edge.getString(1) === "Heading 7! abc see ref 7" && edge.getInt(3) === 3)
  }

  test("SQL callers: bare decimal and integer thresholds coerce instead of throwing") {
    GraftFunctions.register(spark)
    spark.sql("SELECT html_extract('<p>a b c d e</p>', 0.5) AS x").createOrReplaceTempView("v1")
    val r = spark.sql("SELECT x.main_text FROM v1").collect()(0)
    assert(r.getString(0) === "a b c d e")
    val i = spark.sql("SELECT html_extract('<p>a b</p>', 1).main_text AS m").collect()(0)
    assert(i.getString(0) === "a b")
  }

  test("x90 surface matches the closed form on the real corpus at two SFs") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val got = SparkEntry.queries("x90_html_extract")(spark, s"/root/testdata/$sf").collect()
      assert(got.nonEmpty, sf)
      got.foreach { r =>
        val id = r.getLong(0)
        assert(r.getString(1).startsWith(s"nav item $id more links here Heading $id! "), sf)
        assert(r.getString(1).endsWith(s" about & terms"), sf)
        assert(r.getString(2) ===
          r.getString(1)
            .stripPrefix(s"nav item $id more links here ")
            .stripSuffix(" about & terms"), sf)
        assert(r.getInt(3) === 5 && r.getInt(4) === 3, sf)
      }
    }
  }
}
