package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming variant of the hourly tier (SURVEY.md §2.2
  * Streaming row): the SAME tumbling-window aggregation code works in
  * batch and streaming; streaming adds a watermark for late data. The
  * aggregate state is the tiers' algebraic state, so a streamed hourly
  * tier re-aggregates into daily/weekly exactly like the batch one.
  */
object StreamingTier {

  /** tumbling 1-hour tier over a (possibly streaming) pages frame:
    * groupBy(host, window) with the algebraic state columns.
    */
  def hourlyAgg(pages: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(w => pages.withWatermark("warc_ts", w)).getOrElse(pages)
    src
      .select(
        regexp_extract(col("url"), "https://([^/]+)/", 1).as("host"),
        col("warc_ts"),
        length(col("text")).cast("double").as("text_len"))
      .groupBy(col("host"), window(col("warc_ts"), "1 hour").as("w"))
      .agg(
        count(col("text_len")).as("n"),
        sum(col("text_len")).as("sum"),
        sum(col("text_len") * col("text_len")).as("sumsq"),
        min(col("text_len")).as("min"),
        max(col("text_len")).as("max"))
      .select(
        concat(lit("text_length|"), col("host")).as("series_id"),
        ((unix_timestamp(col("w.start")) - CrawlSynth.startEpoch) / 3600L).as("bucket"),
        col("n"), col("sum"), col("sumsq"), col("min"), col("max"))
  }

  /** drive a parquet-backed stream of pages through the hourly agg into
    * an in-memory sink; returns the sink table name. Complete output
    * mode (the tier is a running aggregate).
    */
  def runFileStream(
      spark: org.apache.spark.sql.SparkSession,
      pagesDir: String,
      queryName: String,
      watermark: String = "2 hours"): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(pagesDir).schema
    val stream = spark.readStream.schema(schema).parquet(pagesDir)
    hourlyAgg(stream, None) // complete mode: no watermark needed
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
