package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines —
  * all pure Catalyst expressions (codegen'd, no UDFs) so they run at
  * 100 TB scan speed: language-ID (stopword n-gram heuristic), quality
  * scoring, token counting, document fingerprinting.
  */
object TextOps {

  /** Evaluate `e` ONCE per row even when `f` consumes it inside a
    * higher-order-function lambda. HOF *arguments* are evaluated once per
    * row; only lambda *bodies* re-run per element — so an expression like
    * split(...) passed textually into a transform lambda is re-evaluated
    * once PER ELEMENT (O(n²) per row for shingling; observed 10x+
    * slowdowns). Binding `e` as the single element of an outer
    * transform's argument makes it a lambda variable in `f`, evaluated
    * exactly once per row regardless of how many times `f` references it.
    */
  private[graft] def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** whitespace-token count */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: words + punctuation marks + one
    * extra token per 6 chars of long words (rough GPT-style heuristic).
    */
  def tokenCountBpe(text: Column): Column = {
    val words = tokenCount(text)
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    val longWordExtra = (length(text) - words) / lit(6)
    words + punct + greatest(lit(0), longWordExtra.cast("int"))
  }

  /** single source of truth for the stopword lists: the native LangId
    * expression (the 4 regex alternations below are built from it).
    */
  private val stopwords: Map[String, Seq[String]] = graft.functions.LangId.stopwords

  /** per-language stopword hit count (word-boundary matches) */
  def stopwordHits(text: Column, lang: String): Column = {
    val pat = stopwords(lang).mkString("\\b(", "|", ")\\b")
    regexp_count(lower(text), lit(pat))
  }

  /** n-gram/stopword heuristic language-ID: argmax of per-language
    * stopword hits, "und" (unknown) when nothing matches. Single text
    * pass via the native expression (graft.functions.LangId) — the
    * previous form ran one regexp_count pass per language; semantics are
    * identical (TextOpsSpec cross-checks against [[langIdMultiPass]]).
    */
  def langId(text: Column): Column = graft.functions.LangId(text)

  /** the 4-regex-pass reference form of [[langId]] (spec cross-check) */
  private[graft] def langIdMultiPass(text: Column): Column = {
    val scored = stopwords.keys.toSeq.sorted.map(l => struct(stopwordHits(text, l).as("hits"),
      lit(l).as("lang")))
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** [0,1] quality score from length, alpha ratio, space ratio and mean
    * word length — cheap heuristics of the C4/Gopher-rule family.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val spaces = length(text) - length(regexp_replace(text, " ", ""))
    val words = tokenCount(text).cast("double")
    val alphaRatio = try_divide(alpha, len)
    val meanWordLen = try_divide(len - spaces, words)
    val lenScore = least(lit(1.0), len / lit(500.0))
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(coalesce(alphaRatio, lit(0.0)) * lit(0.4) + lenScore * lit(0.4) +
      wordLenScore * lit(0.2), 6)
  }

  /** stable document fingerprint: md5 of the whitespace-normalized,
    * lower-cased text (exact-dedup key).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** rolling/content-defined fingerprints from an already-split words
    * column (an attribute or lambda variable — see [[bindOnce]]).
    */
  def windowFingerprintsFromWords(words: Column, k: Int): Column = {
    val nWin = greatest(lit(1), size(words) - lit(k - 1))
    transform(sequence(lit(0), nWin - 1),
      i => xxhash64(array_join(slice(words, i + 1, lit(k)), " ")))
  }

  /** rolling/content-defined fingerprint: xxhash64 of every k-word
    * window — robust to small edits at the ends. The split runs once per
    * row ([[bindOnce]]), not once per window.
    */
  def windowFingerprints(text: Column, k: Int = 8): Column =
    bindOnce(split(trim(text), "\\s+"))(w => windowFingerprintsFromWords(w, k))
}
