package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines —
  * all pure Catalyst expressions (codegen'd, no UDFs) so they run at
  * 100 TB scan speed: language-ID (stopword n-gram heuristic), quality
  * scoring, token counting, document fingerprinting.
  */
object TextOps {

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

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "con", "para"))

  /** per-language stopword hit count (word-boundary matches) */
  def stopwordHits(text: Column, lang: String): Column = {
    val pat = stopwords(lang).mkString("\\b(", "|", ")\\b")
    regexp_count(lower(text), lit(pat))
  }

  /** n-gram/stopword heuristic language-ID: argmax of per-language
    * stopword hits, "und" (unknown) when nothing matches.
    */
  def langId(text: Column): Column = {
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

  /** rolling/content-defined fingerprint: xxhash64 of every k-word
    * window, min-sampled — robust to small edits at the ends.
    */
  def windowFingerprints(text: Column, k: Int = 8): Column = {
    val words = split(trim(text), "\\s+")
    val nWin = greatest(lit(1), size(words) - lit(k - 1))
    transform(sequence(lit(0), nWin - 1),
      i => xxhash64(array_join(slice(words, i + 1, lit(k)), " ")))
  }
}
