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

  private def hostCol = regexp_extract(col("url"), "https://([^/]+)/", 1)
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
