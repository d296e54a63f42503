package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap protocol (sitemaps.org, the 2008 Google/Yahoo/Microsoft
  * joint spec) fixtures and parsing — the URL-DISCOVERY stage of the
  * web front matter, beside robots.txt (x99 politeness) and ahead of
  * fetching (x92 WARC) and indexing (x98 CDX): a crawl seeds its
  * frontier from `<urlset>` URL entries and recurses through
  * `<sitemapindex>` child sitemaps.
  *
  * [[BuildSitemap]] emits a deterministic id-derived document of either
  * kind; [[SitemapUrls]] is the real XML-lite walk both kinds flow
  * through. Everything in the fixture is closed-form in the id so the
  * x102 oracle rebuilds every row without parsing XML in SQL.
  */
object SitemapFunctions {

  /** Deterministic sitemap document for doc `id`:
    *
    *   - `id % 4 == 0` → a `<sitemapindex>` with two `<sitemap>` child
    *     entries (first with `<lastmod>2024-06-0{1+id%9}</lastmod>`,
    *     second bare);
    *   - otherwise → a `<urlset>` with three `<url>` entries: one fully
    *     populated (lastmod/changefreq/priority — all three OMITTED when
    *     `id % 3 == 0`), one whose loc carries an `&amp;` entity the
    *     parser must decode, one whose loc is CDATA-wrapped with
    *     spurious surrounding whitespace the parser must trim.
    *
    * Host `example{id % 5}.com`; month `1 + id % 12`, day `1 + id % 28`,
    * changefreq by `id % 3`, priority `0.{id % 10}`.
    */
  private[functions] def doc(id: Long): String = {
    val k = id % 5
    val b = new StringBuilder(512)
    b.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    if (id % 4 == 0) {
      b.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      b.append(s"<sitemap><loc>https://example$k.com/sitemap_${id}_1.xml</loc>")
      b.append(f"<lastmod>2024-06-0${1 + id % 9}</lastmod></sitemap>\n")
      b.append(s"<sitemap><loc>https://example$k.com/sitemap_${id}_2.xml</loc></sitemap>\n")
      b.append("</sitemapindex>\n")
    } else {
      b.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      b.append(s"<url><loc>https://example$k.com/p/$id</loc>")
      if (id % 3 != 0) {
        b.append(f"<lastmod>2024-${1 + id % 12}%02d-${1 + id % 28}%02d</lastmod>")
        b.append(s"<changefreq>${Seq("daily", "weekly", "monthly")((id % 3).toInt)}</changefreq>")
        b.append(s"<priority>0.${id % 10}</priority>")
      }
      b.append("</url>\n")
      b.append(s"<url><loc>https://example$k.com/s?a=$id&amp;b=${id % 7}</loc>")
      b.append("<priority>0.5</priority></url>\n")
      b.append(s"<url><loc> <![CDATA[https://example$k.com/cd/$id]]> </loc>")
      b.append("<lastmod>2024-01-02</lastmod></url>\n")
      b.append("</urlset>\n")
    }
    b.toString
  }
}

/** Deterministic sitemap fixture — see [[SitemapFunctions.doc]]. */
case class BuildSitemap(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(idAny: Any): Any =
    UTF8String.fromString(SitemapFunctions.doc(idAny.asInstanceOf[Long]))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sitemap parse: `array<struct<kind, loc, lastmod, changefreq,
  * priority_ppm>>` in document order, from either a `<urlset>` (kind
  * "url") or a `<sitemapindex>` (kind "sitemap").
  *
  * Walk rules (XML-lite, never a throw):
  *   - a real tag scan: comments `<!-- -->`, PIs/declarations
  *     `<?…?>`/`<!…>` skipped; CDATA sections inside element text are
  *     verbatim content (entities NOT decoded inside CDATA, per XML);
  *   - element text outside CDATA decodes the five XML named entities
  *     and numeric references; unknown/unterminated stay literal (the
  *     HtmlExtract error-recovery convention);
  *   - an entry is a `<url>` or `<sitemap>` element; its `<loc>`,
  *     `<lastmod>`, `<changefreq>`, `<priority>` children are captured
  *     TRIMMED; tag names are case-sensitive per XML (sitemap files are
  *     machine-generated lowercase);
  *   - an entry without a non-empty `<loc>` is skipped (the spec makes
  *     loc required); missing optional fields are NULL columns;
  *   - `<priority>` parses to exact integer PPM (`"0.8"` → 800000,
  *     `"1"` → 1000000, 6 fractional digits kept); unparseable → NULL
  *     (the x12 integer-ppm rule — no doubles cross the oracle
  *     boundary);
  *   - truncation mid-entry emits nothing for that entry (best effort);
  *     NULL only for null input; no entries → empty array.
  *
  * Map-only, one pass, O(doc) — the 100 TB posture is "parse in the
  * scan projection", the same as every codec walk in this repo.
  */
case class SitemapUrls(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(
      StructType(Seq(
        StructField("kind", StringType, nullable = false),
        StructField("loc", StringType, nullable = false),
        StructField("lastmod", StringType, nullable = true),
        StructField("changefreq", StringType, nullable = true),
        StructField("priority_ppm", IntegerType, nullable = true))),
      containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(xmlAny: Any): Any = {
    val s = xmlAny.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]

    // entry state
    var kind: String = null
    var loc: String = null
    var lastmod: String = null
    var changefreq: String = null
    var priority: String = null

    def priorityPpm(p: String): Any = {
      if (p == null) return null
      val t = p.trim
      var i = 0
      var intPart = 0L
      var digits = 0
      while (i < t.length && t.charAt(i) >= '0' && t.charAt(i) <= '9') {
        intPart = intPart * 10 + (t.charAt(i) - '0'); digits += 1; i += 1
        if (digits > 7) return null
      }
      if (digits == 0) return null
      var frac = 0L
      var fd = 0
      if (i < t.length && t.charAt(i) == '.') {
        i += 1
        while (i < t.length && t.charAt(i) >= '0' && t.charAt(i) <= '9') {
          if (fd < 6) { frac = frac * 10 + (t.charAt(i) - '0'); fd += 1 }
          i += 1
        }
      }
      if (i != t.length) return null
      while (fd < 6) { frac *= 10; fd += 1 }
      val ppm = intPart * 1000000L + frac
      if (ppm > Int.MaxValue) null else ppm.toInt
    }

    def emit(): Unit = {
      if (kind != null && loc != null && loc.nonEmpty)
        out += InternalRow(
          UTF8String.fromString(kind),
          UTF8String.fromString(loc),
          if (lastmod == null) null else UTF8String.fromString(lastmod),
          if (changefreq == null) null else UTF8String.fromString(changefreq),
          priorityPpm(priority))
      kind = null; loc = null; lastmod = null; changefreq = null; priority = null
    }

    // capture element text from `from` until the next '<' that is not a
    // CDATA start; returns (decoded-trimmed text, index of that '<') or
    // null text on truncation.
    def captureText(from: Int): (String, Int) = {
      val b = new StringBuilder
      var i = from
      while (i < n) {
        val c = s.charAt(i)
        if (c == '<') {
          if (s.startsWith("<![CDATA[", i)) {
            val e = s.indexOf("]]>", i + 9)
            if (e < 0) return (null, n)
            b.append(s.substring(i + 9, e))
            i = e + 3
          } else return (b.toString.trim, i)
        } else if (c == '&') {
          val semi = s.indexOf(';', i + 1)
          val decoded: Option[Int] =
            if (semi < 0 || semi - i > 10) None
            else {
              val body = s.substring(i + 1, semi)
              if (body.startsWith("#x") || body.startsWith("#X")) {
                try Some(Integer.parseInt(body.substring(2), 16))
                catch { case _: NumberFormatException => None }
              } else if (body.startsWith("#")) {
                try Some(Integer.parseInt(body.substring(1)))
                catch { case _: NumberFormatException => None }
              } else HtmlFunctions.namedEntities.get(body).map(_.toInt)
            }
          decoded match {
            case Some(cp) if Character.isValidCodePoint(cp) && cp != 0 =>
              b.appendAll(Character.toChars(cp)); i = semi + 1
            case _ => b.append('&'); i += 1
          }
        } else { b.append(c); i += 1 }
      }
      (null, n) // truncated inside element text
    }

    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.startsWith("<![CDATA[", i)) { // CDATA outside capture: skip
          val e = s.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val t0 = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)) || s.charAt(j) == '_')) j += 1
          val name = s.substring(t0, j)
          val gt = s.indexOf('>', j)
          if (gt < 0) { i = n } // truncated tag: drop any open entry
          else {
            i = gt + 1
            if (closing) {
              if (name == "url" || name == "sitemap") emit()
            } else if (name == "url") { kind = "url"; loc = null; lastmod = null; changefreq = null; priority = null }
            else if (name == "sitemap") { kind = "sitemap"; loc = null; lastmod = null; changefreq = null; priority = null }
            else if (kind != null &&
              (name == "loc" || name == "lastmod" || name == "changefreq" || name == "priority") &&
              s.charAt(gt - 1) != '/') {
              val (text, at) = captureText(i)
              if (text == null) { i = n }
              else {
                name match {
                  case "loc" => loc = text
                  case "lastmod" => lastmod = text
                  case "changefreq" => changefreq = text
                  case "priority" => priority = text
                }
                i = at // the close tag re-enters the main scan
              }
            }
          }
        }
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
