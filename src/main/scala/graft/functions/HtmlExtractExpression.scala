package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML/markup main-text extraction — the curation pipeline's front
  * door for web-scale corpora (public grounding: the jusText /
  * trafilatura family of boilerplate heuristics; this is an
  * independent implementation of the standard recipe, not a port):
  *
  *  1. `<!-- comments -->`, `<script>…</script>` and
  *     `<style>…</style>` bodies are dropped (case-insensitive;
  *     unterminated forms drop to end-of-input — contained, never
  *     thrown).
  *  2. The document is segmented into BLOCKS at block-level tag
  *     boundaries (`p div br li ul ol h1–h6 table tr td th section
  *     article header footer nav blockquote pre form`); all other
  *     tags are stripped inline. A `<` that never finds its `>` is
  *     treated as an unterminated tag (rest dropped) — the malformed
  *     class is contained, not crashed on.
  *  3. Text inside `<a>…</a>` is counted as LINK text per block; a
  *     block whose visible text is more than half link text is
  *     BOILERPLATE (nav bars, footers, related-links) and dropped —
  *     the link-density heuristic that makes this an extractor
  *     rather than a tag stripper.
  *  4. Basic entities decode (`&amp; &lt; &gt; &quot; &#39; &apos;
  *     &nbsp;` and numeric `&#NNN;`/`&#xHH;` up to 4 hex/5 dec
  *     digits); unknown entities pass through verbatim.
  *  5. Each surviving block's whitespace collapses to single spaces
  *     and is trimmed; blocks join with `\n`. Empty blocks vanish.
  *
  * Deterministic, total, zero-shuffle — a per-row codegen'd
  * projection like the tokenizers. Input round-trips through
  * `String` (entity decoding is a character transform), so malformed
  * UTF-8 normalizes to U+FFFD here — unlike ws_tokens' raw-byte
  * discipline, an EXTRACTOR's output is consumed as text, where
  * normalization is the desired behavior.
  */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         graft.functions.HtmlExtract.extract($c.toString()));""")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object HtmlExtract {

  def apply(html: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(HtmlExtract(GraftShims.toExpression(html)))
  }

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
      "h5", "h6", "table", "tr", "td", "th", "section", "article",
      "header", "footer", "nav", "blockquote", "pre", "form")
      .foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  /** The extraction state machine — one forward scan, no regex. */
  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder
    // current block accumulator + its link-char count
    val block = new java.lang.StringBuilder
    var linkChars = 0
    var textChars = 0
    var aDepth = 0

    def flushBlock(): Unit = {
      // collapse whitespace, trim
      val collapsed = new java.lang.StringBuilder
      var i = 0
      var pendingWs = false
      while (i < block.length()) {
        val c = block.charAt(i)
        if (isWs(c)) pendingWs = collapsed.length() > 0
        else {
          if (pendingWs) collapsed.append(' ')
          pendingWs = false
          collapsed.append(c)
        }
        i += 1
      }
      // boilerplate: majority-link blocks are navigation chrome
      val keep = collapsed.length() > 0 &&
        !(textChars > 0 && linkChars * 2 > textChars)
      if (keep) {
        if (out.length() > 0) out.append('\n')
        out.append(collapsed)
      }
      block.setLength(0)
      linkChars = 0
      textChars = 0
    }

    def appendText(c: Char): Unit = {
      block.append(c)
      if (!isWs(c)) {
        textChars += 1
        if (aDepth > 0) linkChars += 1
      }
    }

    // case-insensitive region match against lowercase `pat`
    def matches(i: Int, pat: String): Boolean =
      i + pat.length <= n && {
        var j = 0
        var ok = true
        while (ok && j < pat.length) {
          ok = Character.toLowerCase(html.charAt(i + j)) == pat.charAt(j)
          j += 1
        }
        ok
      }

    // index just past the matching case-insensitive close tag, or n
    def skipPast(from: Int, close: String): Int = {
      var i = from
      while (i < n && !matches(i, close)) i += 1
      if (i >= n) n else {
        // the close tag may carry attrs/spaces before '>'
        var j = i + close.length
        while (j < n && html.charAt(j) != '>') j += 1
        if (j >= n) n else j + 1
      }
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matches(i, "<!--")) {
          // comment: drop to --> (unterminated drops to end)
          var j = i + 4
          while (j + 2 < n && !(html.charAt(j) == '-' &&
            html.charAt(j + 1) == '-' && html.charAt(j + 2) == '>')) j += 1
          i = if (j + 2 < n) j + 3 else n
        } else if (matches(i, "<script")) {
          i = skipPast(i + 7, "</script")
        } else if (matches(i, "<style")) {
          i = skipPast(i + 6, "</style")
        } else {
          // a tag: find '>', classify by name. The scan honors QUOTED
          // attribute values — '>' inside "..." or '...' is attribute
          // content, not the tag end (onclick="if(a>b)..." and
          // title="x>y" are legal HTML); an unterminated quote runs
          // to end-of-input and lands in the unterminated-tag
          // containment below.
          var j = i + 1
          if (j < n && html.charAt(j) == '/') j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
          val name = html.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          var k = j
          while (k < n && html.charAt(k) != '>') {
            val q = html.charAt(k)
            if (q == '"' || q == '\'') {
              k += 1
              while (k < n && html.charAt(k) != q) k += 1
              if (k < n) k += 1 // past the closing quote
            } else k += 1
          }
          if (k >= n) { i = n } // unterminated tag: contained drop
          else {
            val closing = i + 1 < n && html.charAt(i + 1) == '/'
            if (name == "a") {
              if (closing) { if (aDepth > 0) aDepth -= 1 }
              else if (html.charAt(k - 1) != '/') aDepth += 1
            } else if (BlockTags.contains(name)) {
              flushBlock()
            }
            i = k + 1
          }
        }
      } else if (c == '&') {
        // entity decode: named or numeric; unknown passes verbatim
        val (decoded, next) = decodeEntity(html, i)
        if (decoded >= 0) { appendText(decoded.toChar); i = next }
        else { appendText('&'); i += 1 }
      } else {
        appendText(c)
        i += 1
      }
    }
    flushBlock()
    out.toString
  }

  /** Decode an entity at `i` (html(i) == '&'): returns (codepoint,
    * indexAfter) or (-1, _) when not a recognized entity. */
  private def decodeEntity(html: String, i: Int): (Int, Int) = {
    val n = html.length
    var j = i + 1
    if (j < n && html.charAt(j) == '#') {
      j += 1
      val hex = j < n &&
        (html.charAt(j) == 'x' || html.charAt(j) == 'X')
      if (hex) j += 1
      val start = j
      var v = 0
      while (j < n && j - start < (if (hex) 4 else 5) && {
        val c = html.charAt(j)
        val d = if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d >= 0) { v = v * (if (hex) 16 else 10) + d; true }
        else false
      }) j += 1
      if (j > start && j < n && html.charAt(j) == ';' &&
        v > 0 && v <= 0xFFFF) (v, j + 1)
      else (-1, i)
    } else {
      var e = 0
      while (e < NamedEntities.length) {
        val (pat, ch) = NamedEntities(e)
        if (html.regionMatches(j, pat, 0, pat.length))
          return (ch.toInt, j + pat.length)
        e += 1
      }
      (-1, i)
    }
  }

  // hoisted out of the per-'&' hot path: the decode runs inside a
  // whole-stage-codegen projection, once per ampersand in the corpus
  private val NamedEntities: Array[(String, Char)] = Array(
    ("amp;", '&'), ("lt;", '<'), ("gt;", '>'),
    ("quot;", '"'), ("apos;", '\''), ("nbsp;", ' '))
}
