package graft.extract

import java.nio.charset.StandardCharsets
import java.text.Normalizer

/**
 * E1 — html→text extractor (SURVEY.md §2.2). THE FROZEN SPEC for the
 * "byte-identical extracted text per url" invariant (BASELINE.json:15,
 * SURVEY.md §0.1.1): output per input is pinned by golden xxhash64 digests
 * at v1 and must never change without regenerating goldens in the same
 * commit.
 *
 * Pure, total, locale-independent (no Locale-sensitive ops, NFC via
 * java.text.Normalizer which is Unicode-data stable per JDK): UTF-8 lossy
 * decode → drop <script>/<style>/comments/doctype → strip tags (tags act as
 * token separators) → decode common + numeric entities → NFC → collapse
 * all whitespace runs to single spaces → trim.
 *
 * Hand-rolled single-pass scanner — no regex (backtracking-safe on
 * adversarial 100 TB web input).
 */
object HtmlExtract {

  def text(html: Array[Byte]): String =
    extract(new String(html, StandardCharsets.UTF_8)) // malformed bytes -> U+FFFD

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2)
    var i = 0
    var skipTag: String = null // inside <script>/<style> until matching close

    def startsWithIgnoreCase(pos: Int, s: String): Boolean =
      html.regionMatches(true, pos, s, 0, s.length)

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (skipTag != null) {
          if (startsWithIgnoreCase(i, "</" + skipTag)) {
            skipTag = null
            i = skipToTagEnd(html, i)
            out.append(' ')
          } else i += 1
        } else if (startsWithIgnoreCase(i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          out.append(' ')
        } else {
          val name = tagName(html, i)
          if (name == "script" || name == "style") skipTag = name
          i = skipToTagEnd(html, i)
          out.append(' ')
        }
      } else if (skipTag != null) {
        i += 1
      } else if (c == '&') {
        i = appendEntity(html, i, out)
      } else {
        out.append(c)
        i += 1
      }
    }

    collapseWhitespace(Normalizer.normalize(out, Normalizer.Form.NFC))
  }

  /** Lower-cased tag name after `<` or `</`; empty if not a letter tag. */
  private def tagName(html: String, lt: Int): String = {
    var i = lt + 1
    if (i < html.length && html.charAt(i) == '/') i += 1
    val start = i
    while (i < html.length && {
      val c = html.charAt(i)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    }) i += 1
    val sb = new java.lang.StringBuilder(i - start)
    var j = start
    while (j < i) { // ASCII lowercase only — locale-independent
      val c = html.charAt(j)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      j += 1
    }
    sb.toString
  }

  /** Index just past the closing '>' of the tag starting at `lt`
    * (single-quoted/double-quoted attribute values may contain '>'). */
  private def skipToTagEnd(html: String, lt: Int): Int = {
    var i = lt + 1
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    i
  }

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode the entity at `amp` into `out`; returns the next index.
    * Unknown entities are kept literally. */
  private def appendEntity(html: String, amp: Int, out: java.lang.StringBuilder): Int = {
    val semi = html.indexOf(';', amp + 1)
    if (semi < 0 || semi - amp > 10) { out.append('&'); return amp + 1 }
    val body = html.substring(amp + 1, semi)
    if (body.startsWith("#")) {
      val cp =
        try {
          if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
            Integer.parseInt(body.substring(2), 16)
          else Integer.parseInt(body.substring(1), 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && cp <= 0x10FFFF && Character.isValidCodePoint(cp)) {
        out.appendCodePoint(cp); semi + 1
      } else { out.append('&'); amp + 1 }
    } else named.get(body) match {
      case Some(s) => out.append(s); semi + 1
      case None => out.append('&'); amp + 1
    }
  }

  /** Collapse every whitespace run to one space; trim ends. NBSP (U+00A0)
    * counts as whitespace here even though Character.isWhitespace says no:
    * real web HTML carries raw C2 A0 bytes at least as often as the &nbsp;
    * entity (mapped to plain space above) and both must extract identically.
    * (The check used to be a raw invisible NBSP literal, which read as a
    * plain space — now an explicit escape; behavior unchanged, goldens
    * untouched.) */
  private def collapseWhitespace(s: CharSequence): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pending = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '\u00A0') {
        if (out.length > 0) pending = true
      } else {
        if (pending) { out.append(' '); pending = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
