package graft.rollup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML wrap/extract with the byte-identical round-trip
  * invariant `extract(wrap(t)) == t` per url (BASELINE.json input_hint;
  * SURVEY.md §7.4.7).
  *
  * Pure Catalyst expressions (no UDFs) so the extraction stage stays
  * inside whole-stage codegen at 10^12-row scale. Entity escaping uses
  * the classic order (escape '&' first, unescape it last) which makes the
  * round-trip exact for arbitrary text including pre-escaped entities.
  */
object TextExtract {

  /** Escape the three HTML-special characters. */
  def escape(text: Column): Column = {
    val a = regexp_replace(text, "&", "&amp;")
    val b = regexp_replace(a, "<", "&lt;")
    regexp_replace(b, ">", "&gt;")
  }

  /** Inverse of escape — '&amp;' is resolved last. */
  def unescape(s: Column): Column = {
    val a = regexp_replace(s, "&lt;", "<")
    val b = regexp_replace(a, "&gt;", ">")
    regexp_replace(b, "&amp;", "&")
  }

  /** text + title -> html binary. */
  def wrap(text: Column, title: Column): Column =
    encode(
      concat(
        lit("<html><head><title>"), escape(title),
        lit("</title></head><body><p>"), escape(text),
        lit("</p></body></html>")),
      "UTF-8")

  /** html binary -> extracted text, byte-identical to the wrapped text.
    * Single-pass native expression (graft.functions.ExtractWrapped):
    * byte-scan prefix/marker/suffix location + one-pass entity unescape,
    * replacing an anchored regex capture plus three regexp_replace
    * passes per page (the derive stage's hottest per-row work).
    * TextExtractSpec cross-checks it against [[extractRegex]] on
    * arbitrary round-tripped unicode.
    */
  def extract(html: Column): Column =
    graft.functions.ExtractWrapped(decode(html, "UTF-8"))

  /** the regex/regexp_replace reference form of [[extract]] (the escaped
    * body cannot contain a literal "</p>" — every '<' was escaped — so
    * the anchored greedy capture is unambiguous). Spec cross-check only.
    */
  private[graft] def extractRegex(html: Column): Column =
    unescape(regexp_extract(decode(html, "UTF-8"),
      "(?s)^<html><head><title>.*?</title></head><body><p>(.*)</p></body></html>$", 1))

  def extractTitle(html: Column): Column =
    unescape(regexp_extract(decode(html, "UTF-8"),
      "(?s)^<html><head><title>(.*?)</title>", 1))
}
