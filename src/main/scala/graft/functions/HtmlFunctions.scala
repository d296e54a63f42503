package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction with boilerplate removal — the missing FIRST
  * stage of a web-corpus pipeline (every 100 TB text corpus starts at
  * WARC/HTML, not at clean parquet text). Two expressions under the
  * repo's encode→decode→verify contract (the x29/x49/x53/x89 pattern):
  *
  *   - [[BuildHtml]] plants a document's REAL text inside a fully
  *     deterministic page — head (title/meta/script/style), a nav of
  *     pure-link list items, an HTML comment containing markup, a
  *     content block (heading with a numeric entity + the escaped text
  *     with one inline link), and a link-dense footer with a named
  *     entity — all derived from (doc_id, text) in closed form;
  *   - [[HtmlExtract]] runs a REAL single-pass markup walk (quote-aware
  *     tag scanner, raw-text script/style skip, comment/doctype skip,
  *     head suppression, entity decoding, per-block whitespace collapse)
  *     and segments text at block-level tags, computing each block's
  *     LINK DENSITY (fraction of visible characters inside <a>…</a>) —
  *     the classic boilerplate signal (Kohlschütter et al., WSDM'10
  *     "Boilerplate Detection Using Shallow Text Features"): navigation,
  *     footers, and link farms are link-saturated, body prose is not.
  *
  * The DuckDB oracle recomputes the expected full/main text from
  * (doc_id, text) alone, so a hash match proves the walk stripped the
  * script/style/comment/head content, decoded the entities, split blocks
  * exactly at block-tag boundaries, and measured density per block —
  * none of which can be faked by echoing the input.
  *
  * Scale posture: map-only expressions (no shuffle, no state); at 100 TB
  * these run inside the scan projection with columns pruned to
  * (doc_id, text). Like the media family they are CodegenFallback leaf
  * calls — one virtual eval per row around a hand-written char walk, the
  * same trade the codec walks make (reference: an options ETL, no HTML
  * analog — this extends the engine's text family upstream).
  */
object HtmlFunctions {

  /** Block-level elements: opening OR closing one flushes the current
    * text block. Inline elements (a, b, i, em, span, strong, code, …)
    * do NOT split blocks — their text flows into the enclosing block.
    */
  private[functions] val blockTags: Set[String] = Set(
    "html", "body", "head", "p", "div", "ul", "ol", "li", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "thead", "tbody", "tr",
    "td", "th", "nav", "footer", "header", "section", "article", "aside",
    "main", "blockquote", "pre", "br", "hr", "form", "figure", "figcaption")

  private[functions] val namedEntities: Map[String, Char] = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"', "apos" -> '\'')

  private[functions] def esc(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** The deterministic page template shared by [[BuildHtml]] and
    * [[BuildWarc]] (the WARC fixture embeds the SAME page as each
    * resource record's payload, so the x92 oracle reuses the x90 closed
    * form for the extracted text AND rebuilds the exact byte string for
    * Content-Length / record-offset arithmetic).
    */
  private[functions] def page(id: Long, text: String): String = {
    val h = new StringBuilder(text.length + 512)
    h.append("<!DOCTYPE html>\n<html>\n<head>\n")
    h.append(s"<title>Doc $id</title>\n")
    h.append("<meta charset=\"utf-8\">\n")
    h.append(s"""<script type="text/javascript">var n = $id; if (n < 100) { document.x = "<p>not text</p>"; }</script>""")
    h.append('\n')
    h.append(s"<style>.m${id % 7} { color: #fff; }</style>\n")
    h.append("</head>\n<body>\n<nav><ul>\n")
    h.append(s"""<li><a href="/p/$id">nav item $id</a></li>\n""")
    h.append(s"""<li><a href="/q/${id % 13}">more links here</a></li>\n""")
    h.append("</ul></nav>\n")
    h.append("<!-- boilerplate ends <p>ghost paragraph</p> -->\n")
    h.append("<div class=\"main\">\n")
    h.append(s"<h1>Heading $id&#33;</h1>\n")
    h.append(s"""<p>${esc(text)} see <a href="/ref/$id">ref $id</a></p>\n""")
    h.append("</div>\n")
    h.append(s"""<footer><a href="/about">about</a> &amp; <a href="/tos">terms</a></footer>\n""")
    h.append("</body>\n</html>\n")
    h.toString
  }
}

/** Deterministic HTML page around a document's text — see
  * [[HtmlFunctions]]. Layout (everything id-derived, text HTML-escaped):
  *
  * {{{
  * head:    title "Doc {id}", meta, script (contains "<p>" in a string
  *          and a "<" comparison — a naive tag stripper leaks it),
  *          style ".m{id%7}"
  * nav:     <li><a>nav item {id}</a></li><li><a>more links here</a></li>
  * comment: <!-- boilerplate ends <p>ghost paragraph</p> -->
  * content: <h1>Heading {id}&#33;</h1>
  *          <p>{esc(text)} see <a>ref {id}</a></p>
  * footer:  <a>about</a> &amp; <a>terms</a>
  * }}}
  *
  * Visible-text truth (what a correct extractor recovers, with norm(t) =
  * whitespace-collapsed trimmed t):
  *   - blocks: ["nav item {id}", "more links here", "Heading {id}!",
  *     "{norm(text)} see ref {id}", "about & terms"] — densities
  *     [1.0, 1.0, 0.0, small, ≥ 0.5];
  *   - main text at threshold 0.5 = blocks 3-4 only.
  */
case class BuildHtml(idExpr: Expression, textExpr: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def left: Expression = idExpr
  override def right: Expression = textExpr
  override def dataType: DataType = StringType

  override protected def nullSafeEval(idAny: Any, textAny: Any): Any =
    UTF8String.fromString(
      HtmlFunctions.page(
        idAny.asInstanceOf[Long],
        textAny.asInstanceOf[UTF8String].toString))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(idExpr = l, textExpr = r)
}

/** Single-pass HTML text extraction + link-density boilerplate filter —
  * see [[HtmlFunctions]] for the contract and provenance.
  *
  * Output struct:
  *   - `full_text`:  every visible text block, space-joined (script,
  *     style, comments, declarations, and the whole head suppressed;
  *     entities decoded; whitespace collapsed per block);
  *   - `main_text`:  only blocks whose link density < threshold;
  *   - `n_blocks`:   non-empty visible blocks;
  *   - `n_dropped`:  blocks removed by the density filter.
  *
  * Walk rules (all deterministic, spec-pinned):
  *   - tag scan is attribute-quote-aware ('>' inside a quoted attribute
  *     value does not close the tag); a tag truncated at end-of-input
  *     ends the parse (best effort, never a throw);
  *   - `<script>`/`<style>` are raw-text elements: skipped to their
  *     case-insensitive close tag, or end-of-input if unclosed;
  *   - `<!-- -->` comments, `<!…>` declarations and `<?…?>` PIs are
  *     skipped; an unclosed comment swallows the remainder (the HTML5
  *     eof-in-comment rule);
  *   - text between `<head>` and `</head>` is suppressed; a missing
  *     `</head>` is healed at `<body>`;
  *   - runs of whitespace (and `&nbsp;`) collapse to one space; blocks
  *     are trimmed; a collapsed space inherits the link-ness of the
  *     character FOLLOWING it (so a fully-linked block measures exactly
  *     1.0 and inter-word spaces inside anchors count as link mass);
  *   - entities: the five XML named entities, `&nbsp;`, and
  *     decimal/hex numeric references; an unterminated or unknown
  *     entity is literal text (HTML5 error-recovery behaviour);
  *   - a block is KEPT iff linkChars/totalChars < threshold (strict:
  *     at-threshold blocks are boilerplate).
  *
  * NULL only for null input; a page with no visible text yields empty
  * strings and zero counts (valid-but-empty ≠ null, the x89 rule).
  */
case class HtmlExtract(htmlExpr: Expression, thresholdExpr: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def left: Expression = htmlExpr
  override def right: Expression = thresholdExpr
  // The analyzer inserts implicit casts for SQL callers: a bare `0.5`
  // literal parses as Decimal and an integer threshold as Int — without
  // the declared input types both reached nullSafeEval's
  // asInstanceOf[Double] as a ClassCastException. (Declared as the
  // covariant Seq[DataType] refinement because AbstractDataType is
  // private[sql] in Spark 4.)
  override def inputTypes: Seq[DataType] = Seq(StringType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("full_text", StringType),
    StructField("main_text", StringType),
    StructField("n_blocks", IntegerType),
    StructField("n_dropped", IntegerType)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(htmlAny: Any, thAny: Any): Any = {
    val s = htmlAny.asInstanceOf[UTF8String].toString
    val threshold = thAny.asInstanceOf[Double]
    val n = s.length

    val blocks = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    val sb = new StringBuilder
    var total = 0
    var link = 0
    var pendingSpace = false
    var inHead = false
    var aDepth = 0
    var i = 0

    def flush(): Unit = {
      if (sb.nonEmpty) blocks += ((sb.toString, total, link))
      sb.setLength(0); total = 0; link = 0; pendingSpace = false
    }
    def emit(c: Char): Unit =
      if (!inHead) {
        if (pendingSpace && sb.nonEmpty) {
          sb.append(' '); total += 1; if (aDepth > 0) link += 1
        }
        pendingSpace = false
        sb.append(c); total += 1; if (aDepth > 0) link += 1
      }
    def emitCodePoint(cp: Int): Unit =
      if (Character.isValidCodePoint(cp) && cp != 0) {
        if (Character.isWhitespace(cp) || cp == 0xa0) pendingSpace = true
        else if (Character.isBmpCodePoint(cp)) emit(cp.toChar)
        else { emit(Character.highSurrogate(cp)); emit(Character.lowSurrogate(cp)) }
      }
    // case-insensitive search for pat at/after from; -1 if absent
    def find(pat: String, from: Int): Int = {
      var p = from
      val m = pat.length
      while (p + m <= n) {
        var k = 0
        while (k < m && Character.toLowerCase(s.charAt(p + k)) == pat.charAt(k)) k += 1
        if (k == m) return p
        p += 1
      }
      -1
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3 // unclosed comment: eof-in-comment
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
          (Character.isLetter(s.charAt(i + 1)) || s.charAt(i + 1) == '/')) {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val t0 = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          val name = s.substring(t0, j).toLowerCase(java.util.Locale.ROOT)
          // attribute scan, quote-aware
          var selfClose = false
          var done = false
          while (j < n && !done) {
            val a = s.charAt(j)
            if (a == '"' || a == '\'') {
              val e = s.indexOf(a, j + 1)
              j = if (e < 0) n else e + 1
            } else if (a == '>') {
              selfClose = j > i && s.charAt(j - 1) == '/'
              j += 1; done = true
            } else j += 1
          }
          if (!done) { flush(); i = n } // truncated tag: best-effort stop
          else {
            i = j
            if (name.isEmpty) { /* "</>" etc: ignore */ }
            else if (!closing && (name == "script" || name == "style")) {
              val e = find("</" + name, i)
              if (e < 0) i = n
              else {
                val g = s.indexOf('>', e)
                i = if (g < 0) n else g + 1
              }
              flush() // script/style are block-level in practice
            } else {
              if (name == "head") { flush(); inHead = !closing }
              else if (name == "body") { flush(); inHead = false }
              else if (name == "a" && !selfClose) {
                if (closing) aDepth = math.max(0, aDepth - 1) else aDepth += 1
              }
              if (HtmlFunctions.blockTags.contains(name)) flush()
            }
          }
        } else { emit('<'); i += 1 } // bare '<' in text (HTML5 recovery)
      } else if (Character.isWhitespace(c)) {
        pendingSpace = true; i += 1
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
            } else if (body == "nbsp") Some(0xa0)
            else HtmlFunctions.namedEntities.get(body).map(_.toInt)
          }
        decoded match {
          case Some(cp) => emitCodePoint(cp); i = semi + 1
          case None => emit('&'); i += 1
        }
      } else { emit(c); i += 1 }
    }
    flush()

    val full = blocks.map(_._1).mkString(" ")
    val kept = blocks.filter { case (_, t, l) => t > 0 && l.toDouble / t < threshold }
    InternalRow(
      UTF8String.fromString(full),
      UTF8String.fromString(kept.map(_._1).mkString(" ")),
      blocks.size,
      blocks.size - kept.size)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(htmlExpr = l, thresholdExpr = r)
}

/** `<a href>` link extraction — the step that turns an HTML corpus into
  * a WEB GRAPH (feeds [[graft.operators.PageRank]] / the x14/x56
  * component family): returns every anchor's href attribute value in
  * document order as `array<string>`.
  *
  * Walk rules (shared contract with [[HtmlExtract]]'s scanner):
  *   - attribute scan is quote-aware ('>' inside a quoted value does not
  *     close the tag) and parses real name[=value] pairs — quoted
  *     (single or double) or unquoted values, names case-insensitive,
  *     so `<A HREF=/x>` and `<a class="b" href='/x'>` both yield "/x";
  *   - `<script>`/`<style>` raw text, `<!-- -->` comments, and
  *     `<!…>`/`<?…?>` declarations never contribute links, exactly as
  *     they never contribute text;
  *   - an `<a>` without an href (or with an empty one) yields nothing; a
  *     truncated tag at end-of-input ends the parse (best effort);
  *   - values are verbatim (no entity decode — URL normalization is a
  *     downstream operator's job, and byte-faithful output is what makes
  *     the closed-form oracle exact).
  *
  * NULL only for null input; a page with no anchors yields an empty
  * array (valid-but-empty ≠ null, the x89 rule). Map-only, no state —
  * at 100 TB this runs inside the scan projection right next to
  * HtmlExtract, one pass each.
  */
case class HtmlLinks(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(htmlAny: Any): Any = {
    val s = htmlAny.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    def findCi(pat: String, from: Int): Int = {
      var p = from
      val m = pat.length
      while (p + m <= n) {
        var k = 0
        while (k < m && Character.toLowerCase(s.charAt(p + k)) == pat.charAt(k)) k += 1
        if (k == m) return p
        p += 1
      }
      -1
    }
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
          (Character.isLetter(s.charAt(i + 1)) || s.charAt(i + 1) == '/')) {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val t0 = j
          while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
          val name = s.substring(t0, j).toLowerCase(java.util.Locale.ROOT)
          // real attribute parse: name [= value], quote-aware
          var href: String = null
          var done = false
          while (j < n && !done) {
            val a = s.charAt(j)
            if (a == '>') { done = true; j += 1 }
            else if (Character.isWhitespace(a) || a == '/') j += 1
            else {
              val a0 = j
              while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
              val attr = s.substring(a0, j).toLowerCase(java.util.Locale.ROOT)
              while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
              var value: String = null
              if (j < n && s.charAt(j) == '=') {
                j += 1
                while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
                if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                  val q = s.charAt(j)
                  val e = s.indexOf(q, j + 1)
                  if (e < 0) { value = s.substring(j + 1); j = n }
                  else { value = s.substring(j + 1, e); j = e + 1 }
                } else {
                  val v0 = j
                  while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                    s.charAt(j) != '>') j += 1
                  value = s.substring(v0, j)
                }
              }
              if (attr == "href" && value != null) href = value
            }
          }
          if (!done) i = n // truncated tag: best-effort stop
          else {
            i = j
            if (!closing && name == "a" && href != null && href.nonEmpty)
              out += UTF8String.fromString(href)
            if (!closing && (name == "script" || name == "style")) {
              val e = findCi("</" + name, i)
              if (e < 0) i = n
              else {
                val g = s.indexOf('>', e)
                i = if (g < 0) n else g + 1
              }
            }
          }
        } else i += 1
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `<a href>` extraction WITH anchor text — the (href, text) pair stream
  * that anchor-text aggregation (x101) consumes: per target URL, the
  * texts the web uses to describe it (the classic relevance signal —
  * Brin & Page '98 §2.2 propagate anchor text to the linked page; every
  * production web index aggregates it per target).
  *
  * Returns `array<struct<href, text>>` in document order. The attribute
  * walk is [[HtmlLinks]]' (quote-aware, name[=value], case-insensitive,
  * verbatim href); the TEXT between `<a …>` and its close is captured
  * with [[HtmlExtract]]'s character rules — entities decoded (five XML
  * names, `&nbsp;`, numeric refs; unknown/unterminated stay literal),
  * whitespace runs collapsed to one space, trimmed; markup inside the
  * anchor is stripped but its text kept (`<a><b>x</b> y</a>` → "x y");
  * script/style inside an anchor contribute nothing.
  *
  * Anchor nesting cannot occur in HTML (the parser implicitly closes an
  * open `<a>` when a new one starts — WHATWG §13.2.6.2); this walk does
  * the same: a new href-bearing `<a>` emits the open anchor first. An
  * anchor left open at end-of-input emits best-effort. `<a>` without an
  * href contributes no pair (matching [[HtmlLinks]]), and its text is
  * NOT attributed to any neighbor. NULL only for null input; no anchors
  * → empty array. Map-only, one pass — runs in the scan projection next
  * to HtmlExtract/HtmlLinks at corpus scale.
  */
case class HtmlAnchors(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(
      StructType(Seq(
        StructField("href", StringType, nullable = false),
        StructField("text", StringType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(htmlAny: Any): Any = {
    val s = htmlAny.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]

    var openHref: String = null // non-null ⇔ collecting an anchor's text
    val sb = new StringBuilder
    var pendingSpace = false

    def emit(c: Char): Unit =
      if (openHref != null) {
        if (pendingSpace && sb.nonEmpty) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
    def emitCodePoint(cp: Int): Unit =
      if (Character.isValidCodePoint(cp) && cp != 0) {
        if (Character.isWhitespace(cp) || cp == 0xa0) pendingSpace = true
        else if (Character.isBmpCodePoint(cp)) emit(cp.toChar)
        else { emit(Character.highSurrogate(cp)); emit(Character.lowSurrogate(cp)) }
      }
    def closeAnchor(): Unit =
      if (openHref != null) {
        out += InternalRow(
          UTF8String.fromString(openHref),
          UTF8String.fromString(sb.toString))
        openHref = null; sb.setLength(0); pendingSpace = false
      }
    def findCi(pat: String, from: Int): Int = {
      var p = from
      val m = pat.length
      while (p + m <= n) {
        var k = 0
        while (k < m && Character.toLowerCase(s.charAt(p + k)) == pat.charAt(k)) k += 1
        if (k == m) return p
        p += 1
      }
      -1
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
          (Character.isLetter(s.charAt(i + 1)) || s.charAt(i + 1) == '/')) {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val t0 = j
          while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
          val name = s.substring(t0, j).toLowerCase(java.util.Locale.ROOT)
          var href: String = null
          var done = false
          while (j < n && !done) {
            val a = s.charAt(j)
            if (a == '>') { done = true; j += 1 }
            else if (Character.isWhitespace(a) || a == '/') j += 1
            else {
              val a0 = j
              while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
              val attr = s.substring(a0, j).toLowerCase(java.util.Locale.ROOT)
              while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
              var value: String = null
              if (j < n && s.charAt(j) == '=') {
                j += 1
                while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
                if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                  val q = s.charAt(j)
                  val e = s.indexOf(q, j + 1)
                  if (e < 0) { value = s.substring(j + 1); j = n }
                  else { value = s.substring(j + 1, e); j = e + 1 }
                } else {
                  val v0 = j
                  while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                    s.charAt(j) != '>') j += 1
                  value = s.substring(v0, j)
                }
              }
              if (attr == "href" && value != null) href = value
            }
          }
          if (!done) { closeAnchor(); i = n } // truncated tag
          else {
            i = j
            if (name == "a") {
              closeAnchor() // </a>, or implicit close before a new <a>
              if (!closing && href != null && href.nonEmpty) openHref = href
            } else if (!closing && (name == "script" || name == "style")) {
              val e = findCi("</" + name, i)
              if (e < 0) i = n
              else {
                val g = s.indexOf('>', e)
                i = if (g < 0) n else g + 1
              }
            }
          }
        } else { emit('<'); i += 1 }
      } else if (Character.isWhitespace(c)) {
        pendingSpace = true; i += 1
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
            } else if (body == "nbsp") Some(0xa0)
            else HtmlFunctions.namedEntities.get(body).map(_.toInt)
          }
        decoded match {
          case Some(cp) => emitCodePoint(cp); i = semi + 1
          case None => emit('&'); i += 1
        }
      } else { emit(c); i += 1 }
    }
    closeAnchor() // anchor open at end-of-input: best effort
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
