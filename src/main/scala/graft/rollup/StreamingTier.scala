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

  /** A session clone whose spark.sql.shuffle.partitions is derived from
    * the stream's input size (~64 MB advisory per partition, clamped to
    * the parent session's setting). Streaming stateful exchanges take
    * their partition count — and thus their state-store count per
    * micro-batch — from that conf at query START, and AQE cannot
    * coalesce them afterwards; sizing it from the input does for
    * streaming state what AQE's advisory coalescing does for batch
    * shuffles: tiny streams stop paying a full session's worth of state
    * stores per batch, large ones keep full parallelism. The clone
    * shares the SparkContext (and the parent can read the memory sink
    * via the returned query's `sparkSession`).
    */
  private[graft] def streamSession(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.SparkSession = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
    val cap = spark.sessionState.conf.numShufflePartitions
    val parts = math.min(cap.toLong, math.max(1L, bytes / (64L << 20) + 1L)).toInt
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s2
  }

  /** drive a parquet-backed stream of pages through the hourly agg into
    * an in-memory sink; returns the sink table name. Complete output
    * mode (the tier is a running aggregate). The memory sink registers
    * in the stream's (cloned) session — read it via
    * `q.sparkSession.table(queryName)`.
    */
  def runFileStream(
      spark: org.apache.spark.sql.SparkSession,
      pagesDir: String,
      queryName: String,
      watermark: String = "2 hours"): org.apache.spark.sql.streaming.StreamingQuery = {
    val s2 = streamSession(spark, pagesDir)
    val schema = s2.read.parquet(pagesDir).schema
    val stream = s2.readStream.schema(schema).parquet(pagesDir)
    hourlyAgg(stream, None) // complete mode: no watermark needed
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
