package graft.queries

import graft.Q
import graft.text.TextOps
import graft.util.T
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table, driver-verified
  * where the semantics are expressible in DuckDB SQL (token counting,
  * fingerprints, quality arithmetic); the regex-heuristic language-ID is
  * a rows-only check plus ScalaTest (regex dialects differ between
  * engines).
  */
object TextQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q_text_tokens",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"),
            col("n_chars")),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
             |  n_chars
             |FROM documents""".stripMargin)
    ),
    Q(
      // BPE-ish subword estimate: words + ASCII punctuation + 1 token
      // per 6 chars beyond the word count. The oracle spells out the
      // same arithmetic with the explicit ASCII punct class (Java's
      // \p{Punct}) so both engines count identical characters.
      "q_text_tokens_bpe",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            TextOps.tokenCountBpe(col("text")).cast("long").as("n_tokens_bpe")),
      Some("""SELECT doc_id,
             |  CAST(
             |    len(regexp_split_to_array(trim(text), '\s+'))
             |    + length(text)
             |      - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
             |    + greatest(0, CAST(trunc(
             |        (length(text) - len(regexp_split_to_array(trim(text), '\s+')))
             |          / 6.0) AS INT))
             |  AS BIGINT) AS n_tokens_bpe
             |FROM documents""".stripMargin)
    ),
    Q(
      // rolling k-word window fingerprints (content-defined dedup keys).
      // The xxhash64 values are engine-specific, but the emitted COUNTS
      // are not: n_windows = max(1, words-7), and n_distinct_windows =
      // distinct 8-word windows (hash collisions are absent on this
      // corpus and would fail the compare honestly) — both DuckDB-
      // expressible, so this is a full oracle now (was rows-only in r02)
      "q_text_window_fp",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            size(TextOps.windowFingerprints(col("text"), 8)).as("n_windows"),
            size(array_distinct(TextOps.windowFingerprints(col("text"), 8)))
              .as("n_distinct_windows")),
      Some("""SELECT doc_id,
             |  CAST(greatest(1, len(regexp_split_to_array(trim(text), '\s+')) - 7)
             |    AS INT) AS n_windows,
             |  CAST(len(list_distinct(list_transform(
             |    range(1, greatest(1, len(regexp_split_to_array(trim(text), '\s+')) - 7) + 1),
             |    i -> array_to_string((regexp_split_to_array(trim(text), '\s+'))[i:i+7], ' '))))
             |    AS INT) AS n_distinct_windows
             |FROM documents""".stripMargin)
    ),
    Q(
      "q_text_fingerprint_dups",
      (s, d) =>
        T.documents(s, d)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(TextOps.fingerprint(col("text"))).as("n_distinct_fp")),
      Some("""SELECT lang, count(*) AS n_docs,
             |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
             |    AS n_distinct_fp
             |FROM documents GROUP BY 1""".stripMargin)
    ),
    Q(
      "q_text_quality",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            TextOps.qualityScore(col("text")).as("quality"))
          .filter(col("quality") > 0.5),
      Some("""SELECT doc_id, quality FROM (
             |  SELECT doc_id,
             |    round(
             |      coalesce(len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             |        * 1.0 / nullif(len(text), 0), 0) * 0.4
             |      + least(1.0, len(text) / 500.0) * 0.4
             |      + (CASE WHEN (len(text) - (len(text) - len(replace(text, ' ', ''))))
             |                * 1.0 / nullif(len(regexp_split_to_array(trim(text), '\s+')), 0)
             |                BETWEEN 3.0 AND 10.0
             |              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
             |  FROM documents)
             |WHERE quality > 0.5""".stripMargin)
    ),
    Q(
      // heuristic language-ID: rows-only (regex dialect differs across
      // engines); asserted in TextOpsSpec instead
      "q_text_langid",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), TextOps.langId(col("text")).as("lang_guess"))
          .groupBy(col("lang_guess")).agg(count(lit(1)).as("n")),
      // same stopword-hit argmax in DuckDB: list_sort of (hits, lang)
      // structs, take last = max — replicates Spark's struct ordering
      // (hits first, then lang lexicographic on ties); \b is the same
      // ASCII word boundary in RE2 and Java regex
      Some("""WITH scored AS (
             |  SELECT doc_id, list_sort([
             |    {'hits': len(regexp_extract_all(lower(text),
             |       '\b(der|die|und|das|ist|von|mit|nicht)\b')), 'lang': 'de'},
             |    {'hits': len(regexp_extract_all(lower(text),
             |       '\b(the|and|of|to|in|is|that|with)\b')), 'lang': 'en'},
             |    {'hits': len(regexp_extract_all(lower(text),
             |       '\b(el|los|las|es|una|por|con|para)\b')), 'lang': 'es'},
             |    {'hits': len(regexp_extract_all(lower(text),
             |       '\b(le|la|les|et|des|est|une|dans)\b')), 'lang': 'fr'}])[-1] AS best
             |  FROM documents)
             |SELECT CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_guess,
             |  count(*) AS n
             |FROM scored GROUP BY 1""".stripMargin)
    ),
    Q(
      // per-source token statistics (document-level corpus profiling)
      "q_text_source_stats",
      (s, d) =>
        T.documents(s, d)
          .withColumn("n_tokens", TextOps.tokenCount(col("text")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("bigint").as("total_tokens"),
            avg(col("n_chars")).as("avg_chars"),
            expr("percentile(n_chars, 0.5)").as("median_chars")),
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
             |    AS total_tokens,
             |  avg(n_chars) AS avg_chars,
             |  quantile_cont(n_chars, 0.5) AS median_chars
             |FROM documents GROUP BY 1""".stripMargin)
    )
  )
}
