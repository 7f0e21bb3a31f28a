package graft

import graft.rollup.{CrawlSynth, StreamingTier, Tiers}
import org.apache.spark.sql.functions._

class StreamingTierSpec extends GraftSuite {

  test("streaming hourly tier equals the batch hourly tier") {
    val dir = java.nio.file.Files.createTempDirectory("pages").toString
    val pages = CrawlSynth.pages(spark, 3000, nHosts = 20, numPartitions = 4)
    pages.write.mode("overwrite").parquet(dir)

    val q = StreamingTier.runFileStream(spark, dir, "stream_hourly")
    q.processAllAvailable()
    q.stop()
    val streamed = q.sparkSession.table("stream_hourly")

    val batch = StreamingTier.hourlyAgg(spark.read.parquet(dir))
    val diff = streamed.alias("s").join(batch.alias("b"),
      Seq("series_id", "bucket"), "full")
      .filter(col("s.n").isNull || col("b.n").isNull ||
        col("s.n") =!= col("b.n") ||
        abs(col("s.sum") - col("b.sum")) > lit(1e-6))
    assert(diff.isEmpty, "streamed tier must equal batch tier")
    assert(streamed.count() > 0)
    // streamed state re-aggregates into the daily tier like batch
    val daily = Tiers.rollup(streamed, "hourly", "daily")
    assert(daily.count() > 0)
  }
}

class EntrySpec extends GraftSuite {
  test("flagship entry: ctas pipeline over events returns site scores") {
    val scores = SparkEntry.entry(spark)
    assert(scores.count() > 0)
    val cols = scores.columns.toSet
    assert(cols.contains("timeseries_id") && cols.contains("site") &&
      cols.contains("fdr_corrected_pvalue_logp"))
  }
}
