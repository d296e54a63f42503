package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** UrlNormalize (x95) and the builtin sentence-dedup composition (x96):
  * RFC 3986 rule matrix, malformed-input recovery, and the
  * first-occurrence-order guarantee of array_distinct that x96's
  * semantics stand on.
  */
class UrlAndSentenceSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def norm(url: String): Row =
    Seq(Tuple1(url)).toDF("u")
      .select(GraftFunctions.urlNormalize(col("u")).as("n"))
      .select(col("n.*")).collect()(0)

  test("RFC 3986 rule matrix: case, ports, escapes, dot segments, fragment") {
    // scheme+host lowercase; default port dropped; fragment dropped
    assert(norm("HTTP://EXample.COM:80/A/b#frag").getString(0) === "http://example.com/A/b")
    // https default 443 dropped; other ports kept
    assert(norm("https://h.io:443/x").getString(0) === "https://h.io/x")
    assert(norm("https://h.io:8443/x").getString(0) === "https://h.io:8443/x")
    assert(norm("https://h.io:8443/x").getInt(3) === 8443)
    assert(norm("https://h.io/x").isNullAt(3))
    // unreserved escapes decode; reserved escapes keep UPPER hex
    assert(norm("http://h/%41%7e/%2f%3d").getString(4) === "/A~/%2F%3D")
    // malformed escape verbatim (WHATWG recovery)
    assert(norm("http://h/%zz/%4").getString(4) === "/%zz/%4")
    // dot segments; // preserved; above-root .. dropped
    assert(norm("http://h/a/./b/../c").getString(4) === "/a/c")
    assert(norm("http://h/a//b").getString(4) === "/a//b")
    assert(norm("http://h/../../a").getString(4) === "/a")
    assert(norm("http://h/a/b/..").getString(4) === "/a/")
    // empty path with authority -> '/'
    assert(norm("http://h").getString(4) === "/")
    assert(norm("http://h?q=1").getString(0) === "http://h/?q=1")
    // query kept verbatim modulo escape normalization, order untouched
    assert(norm("http://h/p?b=2&a=%2f").getString(0) === "http://h/p?b=2&a=%2F")
    // userinfo kept verbatim
    assert(norm("http://User@H.io/x").getString(0) === "http://User@h.io/x")
  }

  test("non-absolute or damaged URLs are NULL, never a throw") {
    def isNull(u: String): Boolean =
      Seq(Tuple1(u)).toDF("u")
        .select(GraftFunctions.urlNormalize(col("u")).as("n"))
        .collect()(0).isNullAt(0)
    assert(isNull("/relative/path"))
    assert(isNull("no scheme here"))
    assert(isNull("://missing.scheme/x"))
    assert(isNull("http://"))
    assert(isNull("http://host:99999999999/x")) // unparseable port
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("u")
      .select(GraftFunctions.urlNormalize(col("u")).as("n")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("array_distinct preserves FIRST occurrences in order (x96's load-bearing semantic)") {
    val got = Seq(Tuple1(Seq("b", "a", "b", "c", "a", "d"))).toDF("xs")
      .select(array_distinct(col("xs")).as("d")).collect()(0).getSeq[String](0)
    assert(got === Seq("b", "a", "c", "d"))
  }

  test("sentence dedup collapses the planted duplication and any intra-text repeats") {
    val rows = Seq((1L, "alpha beta. gamma. alpha beta"))
      .toDF("doc_id", "text")
    val sents = split(concat(col("text"), lit(". "), col("text")), "\\. ")
    val out = rows.select(
      concat_ws(". ", array_distinct(sents)).as("clean"),
      size(sents).as("n"),
      (size(sents) - size(array_distinct(sents))).as("dupes")).collect()(0)
    // doubled: [alpha beta, gamma, alpha beta, alpha beta, gamma, alpha beta]
    assert(out.getString(0) === "alpha beta. gamma")
    assert(out.getInt(1) === 6 && out.getInt(2) === 4)
  }

  test("x95/x96 surfaces match their closed forms on the real corpus at two SFs") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val u = SparkEntry.queries("x95_url_normalize")(spark, s"/root/testdata/$sf").collect()
      assert(u.nonEmpty, sf)
      u.foreach { r =>
        val id = r.getLong(0)
        if (id % 2 == 0) {
          assert(r.getString(1) ===
            s"http://example${id % 5}.com/a$id/pAth/$id?b=2&a=%2F", sf)
          assert(r.getString(3) === s"example${id % 5}.com", sf)
        } else {
          assert(r.getString(1) ===
            s"https://sub.example${id % 5}.com:8443/~user//$id/", sf)
          assert(r.getString(4) === s"/~user//$id/", sf)
        }
      }
      val sdd = SparkEntry.queries("x96_sentence_dedup")(spark, s"/root/testdata/$sf").collect()
      assert(sdd.nonEmpty, sf)
      sdd.foreach { r =>
        // the plant guarantees at least the full-text repetition collapsed
        assert(r.getInt(3) >= 1, sf)
        assert(r.getInt(2) > r.getInt(3), sf)
      }
    }
  }
}
