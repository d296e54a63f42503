package graft

import graft.operators.PublicSuffix

/** PublicSuffix (x109): every PSL rule kind, precedence, and the
  * NULL-registrable contract on hand-built hosts.
  */
class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def run(hosts: String*): Map[String, (String, Option[String])] =
    PublicSuffix
      .withRegistrableDomain(hosts.map(Tuple1(_)).toDF("host"), "host")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[String]("public_suffix"), Option(r.getAs[String]("registrable")))))
      .toMap

  test("plain rules: longest label match wins over its parent") {
    val out = run("www.example.co.uk", "example.uk", "deep.a.b.example.com")
    assert(out("www.example.co.uk") === (("co.uk", Some("example.co.uk"))))
    assert(out("example.uk") === (("uk", Some("example.uk"))))
    assert(out("deep.a.b.example.com") === (("com", Some("example.com"))))
  }

  test("private registry entry beats its parent TLD") {
    assert(run("a.user.github.io")("a.user.github.io") ===
      (("github.io", Some("user.github.io"))))
    assert(run("plain.io")("plain.io") === (("io", Some("plain.io"))))
  }

  test("wildcard *.ck makes any single label public; exception !www.ck overrides") {
    assert(run("a.b.ck")("a.b.ck") === (("b.ck", Some("a.b.ck"))))
    assert(run("x.y.z.ck")("x.y.z.ck") === (("z.ck", Some("y.z.ck"))))
    assert(run("www.ck")("www.ck") === (("ck", Some("www.ck"))))
    // the exception rule matches ANY host it suffixes: registrable of
    // www.www.ck is www.ck (the publicsuffix.org test vector), not the
    // wildcard's three-label cut
    assert(run("sub.www.ck")("sub.www.ck") === (("ck", Some("www.ck"))))
  }

  test("a host that IS a public suffix has NULL registrable") {
    val out = run("co.uk", "com", "github.io", "ck")
    assert(out("co.uk") === (("co.uk", None)))
    assert(out("com") === (("com", None)))
    assert(out("github.io") === (("github.io", None)))
    assert(out("ck") === (("ck", None)))
  }

  test("unknown TLD falls back to the implicit-star rule") {
    val out = run("a.b.internal", "internal")
    assert(out("a.b.internal") === (("internal", Some("b.internal"))))
    assert(out("internal") === (("internal", None)))
  }

  test("a bare wildcard-covered label: b.ck is itself public under *.ck") {
    assert(run("b.ck")("b.ck") === (("b.ck", None)))
  }

  test("NULL host yields NULL public_suffix and registrable, not empty strings") {
    val df = Seq((1L, Option("www.example.com")), (2L, Option.empty[String]))
      .toDF("id", "host")
    val out = graft.operators.PublicSuffix
      .withRegistrableDomain(df, "host")
      .orderBy($"id")
      .collect()
    assert(out(0).getString(2) === "com" && out(0).getString(3) === "example.com")
    assert(out(1).isNullAt(2), "NULL host must not render public_suffix ''")
    assert(out(1).isNullAt(3))
  }
}
