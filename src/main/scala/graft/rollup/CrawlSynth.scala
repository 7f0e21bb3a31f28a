package graft.rollup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style page synthesizer (FIXTURES.md §B):
  * (url string, warc_ts timestamp, html binary, text string, lang string).
  *
  * Expression-only generation from spark.range — fully distributed,
  * codegen'd, reproducible at any scale without driver-side state.
  * Hosts follow a log-uniform (Zipf-like) distribution so hot-host skew
  * is present by construction; the timestamp span covers >= 4 weeks so
  * hourly -> daily -> weekly tiers all materialize.
  *
  * Injected anomaly hosts (deterministic, for tier/anomaly tests):
  *   host0: constant text length       -> unique-value check fires
  *   host1: hour-parity zig-zag length -> lag-1 autocorr ~ -1
  *   host2: shifted mean length        -> KS / average outlier
  *   host3: rare huge spikes           -> range / sd outlier
  */
object CrawlSynth {

  val startTs = "2025-01-06 00:00:00" // Monday, UTC
  val startEpoch: Long = 1736121600L // 2025-01-06T00:00:00Z
  val spanHours = 24 * 28 // 4 weeks

  private val vocab = Seq(
    "data", "page", "crawl", "web", "text", "host", "value", "table", "row",
    "spark", "query", "scan", "join", "agg", "filter", "shard", "batch",
    "time", "series", "bucket", "rollup", "tier", "gap", "fill", "point",
    "metric", "score", "flag", "site", "group", "window", "frame", "hash")

  private val langs = Seq("en", "de", "fr", "es", "pt", "it", "nl", "pl")
  private val tlds = Seq("com", "org", "net", "de", "fr", "io")

  /** nPages rows of (url, warc_ts, html, text, lang). */
  def pages(spark: SparkSession, nPages: Long, nHosts: Int = 1000,
      numPartitions: Int = 32): DataFrame = {
    val df = spark.range(0, nPages, 1, numPartitions)
      .withColumn("h1", abs(xxhash64(col("id"), lit(1))))
      .withColumn("h2", abs(xxhash64(col("id"), lit(2))))
      .withColumn("h3", abs(xxhash64(col("id"), lit(3))))
      // log-uniform host index => Zipf-like host sizes (hot-host skew)
      .withColumn("u", (col("h1") % 1000000L) / lit(1000000.0))
      .withColumn("host_idx",
        (floor(pow(lit(nHosts.toDouble), col("u"))) - 1).cast("long"))
      .withColumn("tld",
        element_at(typedLit(tlds), (col("host_idx") % tlds.size).cast("int") + 1))
      .withColumn("host", concat(lit("host"), col("host_idx"), lit("."), col("tld")))
      .withColumn("url", concat(lit("https://"), col("host"), lit("/p/"), col("id")))
      // crawl hour: uniform over the span, deterministic per id
      .withColumn("hour_off", col("h2") % spanHours)
      .withColumn("warc_ts", timestamp_seconds(lit(startEpoch) + col("hour_off") * 3600L))
      // body length with injected anomalies
      .withColumn("n_words",
        when(col("host_idx") === 0, lit(20)) // constant
          .when(col("host_idx") === 1, // zig-zag by hour parity
            when(col("hour_off") % 2 === 0, lit(5)).otherwise(lit(120)))
          .when(col("host_idx") === 2, (col("h3") % 40L) + 220) // shifted mean
          .when(col("host_idx") === 3, // spikes on ~5% of pages
            when(col("h3") % 20L === 0, lit(2000)).otherwise((col("h3") % 40L) + 20))
          .otherwise((col("h3") % 60L) + 10))
      .withColumn("text",
        // host0's body is literally constant so its text_length series is
        // exactly flat (drives the repeated-value anomaly flag)
        when(col("host_idx") === 0,
          lit("constant body of host zero for the repeated-value check"))
          .otherwise(concat(
            lit("page "), col("id"), lit(" of "), col("host"), lit(" : "),
            array_join(
              transform(sequence(lit(1), col("n_words").cast("int")),
                i => element_at(typedLit(vocab),
                  (abs(xxhash64(col("id"), i)) % vocab.size).cast("int") + 1)),
              " "))))
      // per-host primary language + 20% uniform mixture
      .withColumn("lang",
        when(col("h3") % 5L === 0,
          element_at(typedLit(langs), (col("h3") % langs.size).cast("int") + 1))
          .otherwise(element_at(typedLit(langs),
            (col("host_idx") % langs.size).cast("int") + 1)))
      .withColumn("html", TextExtract.wrap(col("text"), concat(lit("doc "), col("id"))))

    df.select("url", "warc_ts", "html", "text", "lang")
  }
}
