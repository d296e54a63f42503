package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** RobotsAllowed (x99): the RFC 9309 rule matrix — group selection,
  * longest-match precedence, wildcards/anchors, and the open-site
  * defaults.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def allowed(robots: String, agent: String, path: String): Boolean =
    Seq((robots, agent, path)).toDF("r", "a", "p")
      .select(GraftFunctions.robotsAllowed(col("r"), col("a"), col("p")).as("x"))
      .collect()(0).getBoolean(0)

  private val basic =
    """User-agent: *
      |Disallow: /private/
      |Allow: /private/ok/
      |""".stripMargin

  test("prefix rules with Allow override by longest match") {
    assert(allowed(basic, "anybot", "/public/x"))
    assert(!allowed(basic, "anybot", "/private/secret"))
    assert(allowed(basic, "anybot", "/private/ok/file"))
    // the rule is a PREFIX match: /private/okbut is under Allow's prefix? No:
    // '/private/ok/' does not prefix '/private/okbut' (trailing slash) →
    // only Disallow '/private/' matches
    assert(!allowed(basic, "anybot", "/private/okbut"))
  }

  test("group selection: longest agent-token prefix wins; * ignored when a specific group matches") {
    val r =
      """User-agent: *
        |Disallow: /
        |User-agent: graftbot
        |Disallow: /only-this/
        |""".stripMargin
    assert(!allowed(r, "randombot", "/anything")) // * group: deny all
    assert(allowed(r, "graftbot/2.1", "/anything")) // specific group only
    assert(!allowed(r, "graftbot/2.1", "/only-this/x"))
    // merged groups: consecutive User-agent lines share rules
    val merged =
      """User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /shared/
        |""".stripMargin
    assert(!allowed(merged, "otherbot", "/shared/x"))
    assert(!allowed(merged, "graftbot", "/shared/x"))
  }

  test("wildcards and anchors: *, trailing $, longest-pattern precedence, Allow wins ties") {
    val r =
      """User-agent: *
        |Disallow: /*.tmp$
        |Disallow: /a/*/deep
        |Allow: /a/keep/deep
        |""".stripMargin
    assert(!allowed(r, "b", "/x/f.tmp"))
    assert(allowed(r, "b", "/x/f.tmp.bak")) // $ anchors the end
    assert(!allowed(r, "b", "/a/z/deep"))
    assert(allowed(r, "b", "/a/keep/deep")) // longer literal Allow wins
    // equal-length tie → Allow wins
    val tie = "User-agent: *\nDisallow: /t/x\nAllow: /t/x\n"
    assert(allowed(tie, "b", "/t/x"))
  }

  test("open-site defaults: empty/garbage robots, empty Disallow, comments, unknown keys") {
    assert(allowed("", "b", "/x"))
    assert(allowed("not a robots file at all", "b", "/x"))
    assert(allowed("User-agent: *\nDisallow:\n", "b", "/x")) // empty Disallow = allow-all
    assert(!allowed("User-agent: * # every crawler\nDisallow: /x # deny\n", "b", "/x/y"))
    assert(allowed(
      "User-agent: *\nCrawl-delay: 10\nSitemap: http://h/s.xml\n", "b", "/x"))
    // rules before any User-agent line have no effect
    assert(allowed("Disallow: /\nUser-agent: *\nAllow: /\n", "b", "/x"))
    // NULL input → NULL
    val n = Seq((null.asInstanceOf[String], "b", "/x")).toDF("r", "a", "p")
      .select(GraftFunctions.robotsAllowed(col("r"), col("a"), col("p")).as("x"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("x99 surface matches the closed-form decision matrix at two SFs") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val got = SparkEntry.queries("x99_robots")(spark, s"/root/testdata/$sf").collect()
      assert(got.nonEmpty, sf)
      got.foreach { r =>
        val id = r.getLong(0)
        val ci = r.getInt(1)
        val expected =
          if (id % 2 == 0) ci != 4
          else ci != 2 && ci != 3
        assert(r.getBoolean(4) === expected, s"$sf doc=$id case=$ci path=${r.getString(2)}")
      }
    }
  }
}
