package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HtmlExtract: tag stripping, block segmentation, link-density
  * boilerplate dropping, entity decoding, and the malformed-markup
  * containment class — every case total and deterministic. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String = HtmlExtract.extract(html)

  test("plain extraction: tags strip, blocks join with newline, " +
    "whitespace collapses, inline tags don't split blocks") {
    assert(x("<html><body><p>Hello   world</p><p>Second</p></body></html>")
      == "Hello world\nSecond")
    assert(x("<p>a <b>bold</b> and <i>italic</i> run</p>")
      == "a bold and italic run")
    assert(x("<div>one</div><div>  </div><div>two</div>") == "one\ntwo")
    assert(x("line<br>break") == "line\nbreak")
    assert(x("no markup at all") == "no markup at all")
    assert(x("") == "")
    assert(x("   \t\n  ") == "")
  }

  test("script/style/comment bodies drop, including case variants " +
    "and attributed close tags") {
    assert(x("<p>keep</p><script>var x = '<p>not text</p>';</script>")
      == "keep")
    assert(x("<STYLE type='css'>p { color: red }</STYLE><p>kept</p>")
      == "kept")
    assert(x("<p>a<!-- hidden <p>ghost</p> -->b</p>") == "ab")
    assert(x("<p>before</p><SCRIPT>alert(1)</SCRIPT \n ><p>after</p>")
      == "before\nafter")
  }

  test("link-density boilerplate: majority-link blocks drop, " +
    "mixed-content blocks survive") {
    val html = "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      "<p>Real content with a single <a href='x'>link</a> inside a " +
      "longer paragraph of prose.</p>" +
      "<footer><a href='/c'>Contact</a></footer>"
    assert(x(html) == "Real content with a single link inside a " +
      "longer paragraph of prose.")
    // exactly half link text is NOT boilerplate (strictly-more rule)
    assert(x("<p><a href=x>ab</a>cd</p>") == "abcd")
    assert(x("<p><a href=x>abc</a>cd</p>") == "")
  }

  test("entities decode (named, decimal, hex); unknown and " +
    "unterminated pass through verbatim") {
    assert(x("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos; " +
      "&#65;&#x42;</p>") == "a & b <tag> \"q\" 's' AB")
    assert(x("<p>5 &notanentity; &amp</p>") == "5 &notanentity; &amp")
    assert(x("<p>x&nbsp;y</p>") == "x y")
  }

  test("malformed markup is contained: unterminated tag/script/" +
    "comment, stray close tags, nested anchors — never throws") {
    assert(x("<p>visible</p><b") == "visible")
    assert(x("<p>visible</p><script>never closed") == "visible")
    assert(x("<p>visible</p><!-- never closed") == "visible")
    assert(x("</div><p>text</p></span></div>") == "text")
    // nested/unbalanced anchors keep the depth sane
    assert(x("<p><a><a>ll</a>mm</a>nn oo pp qq</p>") == "llmmnn oo pp qq")
    assert(x("</a></a><p>free text</p>") == "free text")
    // self-closing anchor does not open link context
    assert(x("<p><a href='x'/>prose text here</p>") == "prose text here")
  }

  test("quoted attribute values may contain '>': the tag ends at the " +
    "first UNQUOTED '>', and an unterminated quote is contained") {
    assert(x("<p><a href=\"#\" onclick=\"if(a>b)f()\">link</a> in a " +
      "longer prose sentence</p>") == "link in a longer prose sentence")
    assert(x("<div title=\"x>y\">text</div>") == "text")
    assert(x("<div title='a>b' data-x='c>d'>kept</div>") == "kept")
    // unterminated quote runs to end-of-input: contained, nothing leaks
    assert(x("<p>before</p><div title=\"never closed > more") == "before")
  }

  test("DataFrame path: codegen equals direct calls; null in null out") {
    val rows = Seq(Some("<p>a</p>"), None).toDF("h")
      .select(HtmlExtract($"h").as("t")).collect()
    assert(rows(0).getString(0) == "a" && rows(1).isNullAt(0))
  }
}
