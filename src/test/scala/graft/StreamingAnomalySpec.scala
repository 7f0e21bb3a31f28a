package graft

import graft.rollup.{CrawlSynth, StreamingTier}
import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.PointIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stateful streaming semantics: flatMapGroupsWithState carries per-series
  * state across micro-batches; event-time watermarks finalize windows and
  * drop late data in append mode (SURVEY.md §2.2 Streaming row).
  */
class StreamingAnomalySpec extends GraftSuite {

  test("flatMapGroupsWithState spike detector keeps state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PointIn]
    val q = StreamingAnomaly.detect(input.toDS(), minN = 5, zThreshold = 4.0)
      .writeStream.outputMode("append").format("memory").queryName("anoms").start()
    try {
      // micro-batch 1: a stable series — no anomalies
      input.addData((0 until 20).map(i => PointIn("s1", i.toLong, 10.0 + (i % 3) * 0.5)))
      q.processAllAvailable()
      assert(spark.table("anoms").count() === 0)

      // micro-batch 2: a spike; the detector must remember batch 1's
      // state (n=20, mean~10.5) to flag it
      input.addData(Seq(PointIn("s1", 20L, 100.0)))
      q.processAllAvailable()
      val rows = spark.table("anoms").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Long]("bucket") === 20L)
      assert(rows(0).getAs[Double]("z") > 4.0)
      assert(rows(0).getAs[Long]("n_seen") === 20L)

      // micro-batch 3: series returns to normal — no new anomalies, and
      // the spike is now part of the state (sd inflated, so 12 is fine)
      input.addData(Seq(PointIn("s1", 21L, 12.0)))
      q.processAllAvailable()
      assert(spark.table("anoms").count() === 1)
    } finally q.stop()
  }

  test("event-time watermark finalizes windows and drops late data (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, java.sql.Timestamp, String)]
    val pages = input.toDF().toDF("url", "warc_ts", "text")
    val q = StreamingTier.hourlyAgg(pages, watermark = Some("30 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("wm_tier").start()
    def ts(min: Long) = new java.sql.Timestamp(CrawlSynth.startEpoch * 1000L + min * 60000L)
    try {
      // two pages in hour 0 — window still open, nothing emitted yet
      input.addData(("https://a.com/1", ts(10), "x" * 100))
      input.addData(("https://a.com/2", ts(20), "y" * 50))
      q.processAllAvailable()

      // an event in hour 2 pushes the watermark to 130-30=100 min,
      // past hour 0's window end (60) -> hour 0 finalizes and emits
      input.addData(Seq(("https://a.com/3", ts(130), "z" * 10)))
      q.processAllAvailable()
      val hour0 = spark.table("wm_tier").filter(col("bucket") === 0).collect()
      assert(hour0.length === 1)
      assert(hour0(0).getAs[Long]("n") === 2L)
      assert(hour0(0).getAs[Double]("sum") === 150.0)

      // a LATE hour-0 event behind the watermark must be dropped: no
      // second emission, counts unchanged
      input.addData(Seq(("https://a.com/4", ts(30), "w" * 10)))
      q.processAllAvailable()
      val fin = spark.table("wm_tier").filter(col("bucket") === 0).collect()
      assert(fin.length === 1)
      assert(fin(0).getAs[Long]("n") === 2L)
    } finally q.stop()
  }

  test("detector logic is identical on a plain batch Dataset") {
    import spark.implicits._
    val pts = ((0 until 20).map(i => PointIn("s1", i.toLong, 10.0 + (i % 3) * 0.5)) :+
      PointIn("s1", 20L, 100.0) :+ PointIn("s2", 0L, 1.0)).toDS()
    val out = StreamingAnomaly.detect(pts, minN = 5, zThreshold = 4.0).collect()
    assert(out.length === 1 && out(0).series_id === "s1" && out(0).bucket === 20L)
  }
}
