package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {
  private def x(s: String) = HtmlExtract.extract(s)

  test("strips tags, keeps text, tags separate tokens") {
    assert(x("<p>hello</p><p>world</p>") === "hello world")
    assert(x("a<br>b") === "a b")
  }

  test("drops script and style contents entirely") {
    assert(x("<script>var x = '<p>not text</p>';</script>visible") === "visible")
    assert(x("<style>p { color: red }</style>ok") === "ok")
    assert(x("<SCRIPT>if(a<b){}</SCRIPT>after") === "after")
  }

  test("drops comments and doctype") {
    assert(x("<!-- secret -->shown") === "shown")
    assert(x("<!DOCTYPE html>doc") === "doc")
    assert(x("<!-- unterminated") === "")
  }

  test("decodes named and numeric entities") {
    assert(x("a&amp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39;") === "a&b <tag> \"q\" 's'")
    assert(x("&#65;&#x42;") === "AB")
    assert(x("100&nbsp;km") === "100 km")
    assert(x("&unknown; stays") === "&unknown; stays")
    assert(x("&#xZZ; bad") === "&#xZZ; bad")
  }

  test("collapses whitespace runs including NBSP and trims") {
    assert(x("  a \t\n b   c  ") === "a b c")
  }

  test("attribute values may contain '>'") {
    assert(x("""<a title="a > b">link</a>""") === "link")
    assert(x("<img alt='x > y'>z") === "z")
  }

  test("unterminated tag at EOF") {
    assert(x("text <div class=") === "text")
  }

  test("NFC normalization: decomposed é equals composed é") {
    val decomposed = "café" // e + combining acute
    val composed = "café"
    assert(x(decomposed) === composed)
  }

  test("lossy UTF-8 decode never throws") {
    val bad = Array[Byte]('a', 0xFF.toByte, 0xFE.toByte, 'b')
    assert(HtmlExtract.text(bad).nonEmpty)
  }

  test("full page shape") {
    val html = "<html><head><title>T</title><script>junk()</script></head>" +
      "<body><h1>Head&quot;er&quot;</h1><p>body text</p></body></html>"
    assert(x(html) === "T Head\"er\" body text")
  }
}
