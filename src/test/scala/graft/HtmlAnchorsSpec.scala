package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.GraftFunctions
import graft.operators.AnchorText

/** HtmlAnchors (x101 front end): (href, text) pair extraction — the
  * HtmlLinks attribute walk plus HtmlExtract's text character rules —
  * and the AnchorText plurality aggregation.
  */
class HtmlAnchorsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def anchors(html: String): Seq[(String, String)] =
    Seq(Tuple1(html)).toDF("h")
      .select(GraftFunctions.htmlAnchors(col("h")).as("a"))
      .collect()(0).getSeq[Row](0)
      .map(r => (r.getString(0), r.getString(1)))

  test("basic pairs in document order, text trimmed and collapsed") {
    assert(anchors("""<a href="/a">hello</a>""") === Seq("/a" -> "hello"))
    assert(anchors("""<a href="/a">  two   words </a>""") === Seq("/a" -> "two words"))
    assert(anchors("""<p><a href="/1">a</a> mid <a href="/2">b</a></p>""") ===
      Seq("/1" -> "a", "/2" -> "b"))
  }

  test("markup inside the anchor is stripped, its text kept") {
    assert(anchors("""<a href="/a"><b>bold</b> and <i>italic</i></a>""") ===
      Seq("/a" -> "bold and italic"))
  }

  test("entities decode by HtmlExtract's rules; unknown stays literal") {
    assert(anchors("""<a href="/a">a &amp; b&#33;</a>""") === Seq("/a" -> "a & b!"))
    assert(anchors("""<a href="/a">x&nbsp;y</a>""") === Seq("/a" -> "x y"))
    assert(anchors("""<a href="/a">5 &undefined; 6</a>""") === Seq("/a" -> "5 &undefined; 6"))
  }

  test("a new <a> implicitly closes the open one (anchors cannot nest)") {
    assert(anchors("""<a href="/1">first <a href="/2">second</a>""") ===
      Seq("/1" -> "first", "/2" -> "second"))
  }

  test("anchor open at end-of-input emits best-effort") {
    assert(anchors("""<a href="/eof">tail text""") === Seq("/eof" -> "tail text"))
  }

  test("hrefless or empty-href anchors contribute no pair and no leaked text") {
    assert(anchors("""<a name="top">skip me</a><a href="/k">keep</a>""") ===
      Seq("/k" -> "keep"))
    assert(anchors("""<a href="">skip</a>""") === Seq.empty)
  }

  test("script/style/comment decoys contribute neither anchors nor text") {
    assert(anchors("""<a href="/a">x<script>var g = '<a href="/ghost">g</a>';</script>y</a>""") ===
      Seq("/a" -> "xy"))
    assert(anchors("""<!-- <a href="/ghost">g</a> --><a href="/r">real</a>""") ===
      Seq("/r" -> "real"))
  }

  test("quote-aware attribute scan: '>' inside a quoted value") {
    assert(anchors("""<a title="1 > 0" href="/gt">x</a>""") === Seq("/gt" -> "x"))
  }

  test("null in, null out; no anchors, empty array") {
    val out = Seq(Tuple1(null: String), Tuple1("<p>no links</p>"))
      .toDF("h").select(GraftFunctions.htmlAnchors(col("h")).as("a")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Row](0).isEmpty)
  }

  test("AnchorText.aggregate: plurality with (cnt desc, text asc) tie-break") {
    val pairs = Seq(
      (1L, "/t", "alpha"), (2L, "/t", "alpha"), (3L, "/t", "beta"),
      (3L, "/t", "gamma"), // doc 3 links /t twice under two texts
      (4L, "/u", "x"), (5L, "/u", "y") // tie at cnt=1 → lexicographic
    ).toDF("doc_id", "href", "text")
    val out = AnchorText.aggregate(pairs).collect()
      .map(r => r.getString(0) -> r).toMap
    val t = out("/t")
    assert(t.getAs[Long]("n_links") === 4L)
    assert(t.getAs[Long]("n_src_docs") === 3L) // doc 3 counted once
    assert(t.getAs[Long]("n_texts") === 3L)
    assert(t.getAs[String]("top_text") === "alpha")
    assert(t.getAs[Long]("top_cnt") === 2L)
    assert(out("/u").getAs[String]("top_text") === "x")
  }
}
