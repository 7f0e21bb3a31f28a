package graft.tools

import graft.rollup._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScalingProbe {
  def session(cores: Int, shuffleParts: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe$cores-$shuffleParts")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.local.dir", sys.env.getOrElse("PROBE_LOCALDIR", "/tmp"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def pipeline(spark: SparkSession, dir: String): Long = {
    val pages = spark.read.parquet(dir)
    val series = SeriesDerive.hostSeriesFromHtml(pages)
    val dense = GapFill.locf(GapFill.densify(
      series.withColumn("bucket", col("hour_rank").cast("long")),
      Seq("series_id"), "bucket", "value"), Seq("series_id"), "bucket", "value", "v")
    val hourly = Tiers.hourly(
      dense.select(col("series_id"), col("bucket").as("hour_rank"), col("v").as("value")),
      "series_id", "hour_rank", "value")
    val daily = Tiers.rollup(hourly, "hourly", "daily")
    val weekly = Tiers.rollup(daily, "daily", "weekly")
    hourly.count() + daily.count() + weekly.count() + Tiers.anomalyFlags(daily).count()
  }
  def timed(spark: SparkSession, dir: String, tag: String): Double = {
    def st[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe]   $tag/$l ${(System.nanoTime()-t0)/1e9}%.1fs"); r
    }
    val t0 = System.nanoTime()
    val pages = spark.read.parquet(dir)
    val series = SeriesDerive.hostSeriesFromHtml(pages)

    val dense = GapFill.locf(GapFill.densify(
      series.withColumn("bucket", col("hour_rank").cast("long")),
      Seq("series_id"), "bucket", "value"), Seq("series_id"), "bucket", "value", "v")
    val hourly = Tiers.hourly(
      dense.select(col("series_id"), col("bucket").as("hour_rank"), col("v").as("value")),
      "series_id", "hour_rank", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    st("hourly")(hourly.count())
    val daily = Tiers.rollup(hourly, "hourly", "daily")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    st("daily+flags")(daily.count() + Tiers.rollup(daily, "daily", "weekly").count() + Tiers.anomalyFlags(daily).count())
    hourly.unpersist(); daily.unpersist()
    val sec = (System.nanoTime()-t0)/1e9
    val pts = 1L
    println(f"[probe] $tag sec=$sec%.1f pps=${(pts/sec).round}")
    pts/sec
  }
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/probe_pages10m"
    if (!new java.io.File(dir + "/_SUCCESS").exists()) {
      val s = session(32, 64)
      CrawlSynth.pages(s, 10000000L, 20000, 128).write.mode("overwrite").parquet(dir)
      s.stop()
    }
    for (sp <- Seq(128)) {
      val hi = session(32, sp)
      timed(hi, dir, s"warm32/$sp"); val p32 = timed(hi, dir, s"hi32/$sp")
      hi.stop()
      val lo = session(8, sp)
      timed(lo, dir, s"warm8/$sp"); val p8 = timed(lo, dir, s"lo8/$sp")
      lo.stop()
      println(f"[probe] sp=$sp efficiency=${p32/p8/4.0}%.3f")
    }
  }
}
