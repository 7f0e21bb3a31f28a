package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derivation stage: crawl pages -> ctas-shaped series tables
  * (FIXTURES.md §B mapping), so every ctas kernel and site-scoring path
  * runs unchanged over crawl data.
  *
  *   parameter_id = metric (pages_per_hour | text_length | lang_share_<l>)
  *   subject_id   = host shard (host + url-hash bucket); site = host
  *   country      = registered domain group (host TLD)
  *   region       = TLD class (gTLD vs ccTLD)
  *   timepoint_rank = hour index since the crawl start
  *
  * All aggregations are algebraic (count/avg) => Spark performs map-side
  * partial aggregation automatically, which is the primary hot-host skew
  * defense for this stage (SURVEY.md §4.2); AQE handles residual join
  * skew downstream.
  */
object SeriesDerive {

  val gTlds = Set("com", "org", "net", "io")

  def hourRank(tsCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((unix_timestamp(tsCol) - CrawlSynth.startEpoch) / 3600L).cast("double")

  /** shards per host: subjects are url-hash buckets within a site(host)
    * so the site-scoring paths (which need >1 subject per site) apply.
    */
  val shardsPerHost = 4

  // host from "scheme://host/path" without a regex pass: two delimiter
  // scans (substring_index is codegen'd byte search). Guarded so a
  // malformed url WITHOUT "://" yields "" — matching the previous
  // regexp_extract's non-match behavior — instead of substring_index's
  // whole-input fallback (ADVICE r03).
  private def hostCol =
    when(contains(col("url"), lit("://")),
      substring_index(substring_index(col("url"), "://", -1), "/", 1))
      .otherwise(lit(""))
  private def shardCol =
    concat(hostCol, lit("#"), pmod(xxhash64(col("url")), lit(shardsPerHost)))

  /** host-shard dimension table (ctas `subjects` shape). */
  def hosts(pages: DataFrame): DataFrame =
    pages
      .select(shardCol.as("subject_id"), hostCol.as("host"))
      .distinct()
      .select(
        col("subject_id"),
        col("host").as("site"),
        regexp_extract(col("host"), "\\.([a-z]+)$", 1).as("country"),
        when(regexp_extract(col("host"), "\\.([a-z]+)$", 1)
          .isin(gTlds.toSeq: _*), "gTLD").otherwise("ccTLD").as("region"))

  /** Host-level long series for the tier engine: one row per
    * (metric, host, hour bucket) with series_id = metric|host.
    */
  def hostSeries(pages: DataFrame): DataFrame =
    seriesFrom(pages, hostCol)
      .select(
        concat(col("parameter_id"), lit("|"), col("subject_id")).as("series_id"),
        col("timepoint_rank").as("hour_rank"),
        col("result").as("value"))

  /** Full derivation from the raw crawl shape: text comes from the html
    * BINARY via the byte-exact extractor (the production path — the
    * `text` column is the generator's oracle, not an input). Runs the
    * extraction inside the scan projection so the html column feeds
    * whole-stage codegen once and is never shuffled.
    */
  def hostSeriesFromHtml(pages: DataFrame): DataFrame =
    hostSeries(pages
      .select(col("url"), col("warc_ts"), col("lang"),
        TextExtract.extract(col("html")).as("text")))

  /** Production derive: extraction from the html binary with the
    * byte-identical check, plus the per-page text-analysis metrics
    * (tokens, quality, language-ID, simhash fingerprint) aggregated into
    * per-(host, hour) series — the full training-data derive stage.
    * Emits series_id = metric|host rows for the tier engine.
    */
  private def avg_len_word(t: Column): Column =
    try_divide(length(t).cast("double"), graft.text.TextOps.tokenCount(t))

  def hostSeriesRich(pages: DataFrame): DataFrame = {
    // Three-stage projection so each expensive intermediate (extracted
    // text, the split words array) is computed ONCE per row and
    // referenced as an attribute downstream — CollapseProject keeps
    // multi-referenced non-cheap aliases in their own projection, and
    // lambdas over a words ATTRIBUTE don't re-split per element.
    val base = pages
      .select(
        hostCol.as("host"),
        ((unix_timestamp(col("warc_ts")) - CrawlSynth.startEpoch) / 3600L)
          .cast("long").as("hour_rank"),
        TextExtract.extract(col("html")).as("xtext"),
        col("text"), col("lang"))
      .select(col("host"), col("hour_rank"), col("xtext"), col("text"),
        split(trim(col("xtext")), "\\s+").as("xwords"))
      .select(col("host"), col("hour_rank"),
        // byte-identical extraction invariant, validated inline
        (col("xtext") === col("text")).cast("double").as("extract_ok"),
        length(col("xtext")).cast("double").as("text_len"),
        when(length(trim(col("xtext"))) === 0, 0.0)
          .otherwise(size(col("xwords")).cast("double")).as("n_tokens"),
        // quality from the materialized words array; alpha ratio via the
        // single-scan native counter (no per-row string rebuild)
        (coalesce(try_divide(
          graft.functions.AsciiAlphaCount(col("xtext")).cast("double"),
          length(col("xtext")).cast("double")), lit(0.0)) * 0.4 +
          least(lit(1.0), length(col("xtext")) / lit(500.0)) * 0.4 +
          when(try_divide(length(col("xtext")).cast("double"),
            size(col("xwords")).cast("double")).between(3.0, 10.0), 1.0)
            .otherwise(0.5) * 0.2).as("quality"),
        try_divide(length(col("xtext")).cast("double"),
          size(col("xwords")).cast("double")).as("lang_match"),
        (pmod(graft.functions.SimHash64(col("xwords"), 2),
          lit(1024)) / 1024.0).as("fp_bucket"))
    val perBucket = base
      .groupBy(col("host"), col("hour_rank"))
      .agg(
        count(lit(1)).cast("double").as("pages_per_hour"),
        avg(col("text_len")).as("text_length"),
        avg(col("n_tokens")).as("tokens"),
        avg(col("quality")).as("quality"),
        avg(col("lang_match")).as("lang_match"),
        avg(col("extract_ok")).as("extract_ok"),
        avg(col("fp_bucket")).as("fp_spread"))
    perBucket.select(col("host"), col("hour_rank"),
      expr("""stack(7,
        'pages_per_hour', pages_per_hour,
        'text_length', text_length,
        'tokens', tokens,
        'quality', quality,
        'lang_match', lang_match,
        'extract_ok', extract_ok,
        'fp_spread', fp_spread) AS (metric, value)"""))
      .select(concat(col("metric"), lit("|"), col("host")).as("series_id"),
        col("hour_rank"), col("value"))
  }

  /** ctas `data` fact table: one row per (metric, host shard, hour bucket). */
  def series(pages: DataFrame): DataFrame = seriesFrom(pages, shardCol)

  private def seriesFrom(pages: DataFrame, subject: Column): DataFrame = {
    val base = pages
      .select(
        subject.as("host"),
        hourRank(col("warc_ts")).as("timepoint_rank"),
        length(col("text")).cast("double").as("text_len"),
        col("lang"))

    val perBucket = base
      .groupBy(col("host"), col("timepoint_rank"))
      .agg(
        count(lit(1)).cast("double").as("pages_per_hour"),
        avg(col("text_len")).as("text_length"),
        avg(when(col("lang") === "en", 1.0).otherwise(0.0)).as("lang_share_en"))

    perBucket.select(
      col("host").as("subject_id"),
      col("timepoint_rank"),
      expr("""stack(3,
        'pages_per_hour', pages_per_hour,
        'text_length', text_length,
        'lang_share_en', lang_share_en) AS (parameter_id, result)"""))
      .select(
        col("subject_id"), col("parameter_id"),
        concat(lit("h"), col("timepoint_rank").cast("int")).as("timepoint_1_name"),
        lit(null).cast("string").as("timepoint_2_name"),
        col("timepoint_rank"), col("result"),
        lit(null).cast("double").as("baseline"))
  }

  /** ctas `parameters` table for the derived metrics. */
  def parameters(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("parameter_id", StringType),
      StructField("parameter_name", StringType),
      StructField("parameter_category_1", StringType),
      StructField("parameter_category_2", StringType),
      StructField("parameter_category_3", StringType),
      StructField("time_point_count_min", DoubleType),
      StructField("subject_count_min", DoubleType),
      StructField("max_share_missing", DoubleType),
      StructField("generate_change_from_baseline", BooleanType),
      StructField("timeseries_features_to_calculate", StringType),
      StructField("use_only_custom_timeseries", BooleanType)))
    val rows = Seq("pages_per_hour", "text_length", "lang_share_en").map { m =>
      org.apache.spark.sql.Row(m, m, null, null, null, null, null, null, null, null, null)
    }
    spark.createDataFrame(rows.asJava, schema)
  }
}
