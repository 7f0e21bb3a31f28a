package graft.tools

import graft.rollup._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N-vs-4N scaling measurement for the end-to-end rollup job
  * (BASELINE.md evidence). PROBE_LO / PROBE_HI select core counts;
  * PROBE_PAGES the input size; PROBE_LOCALDIR the shuffle dir.
  */
object ScalingProbe {

  def session(cores: Int, shuffleParts: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe$cores-$shuffleParts")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.local.dir", sys.env.getOrElse("PROBE_LOCALDIR",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-local"
        else "/tmp"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** the measured job: scan -> extract+text-metrics derive -> gap-fill
    * the continuous metrics -> hourly/daily/weekly tiers -> anomaly flags
    */
  def pipeline(spark: SparkSession, dir: String): Long = {
    val pages = spark.read.parquet(dir)
    // persist the derived series: BOTH the continuous (gap-filled) and
    // sparse branches read it — without this the scan+extract+metrics
    // derive runs twice
    val series = SeriesDerive.hostSeriesRich(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // gap-fill only continuous metrics (LOCF on count-like metrics is
    // semantically wrong: a missing hour means zero pages)
    val continuous = series.filter(
      col("series_id").startsWith("text_length") ||
        col("series_id").startsWith("quality") ||
        col("series_id").startsWith("lang_match"))
    val sparse = series.filter(!(
      col("series_id").startsWith("text_length") ||
        col("series_id").startsWith("quality") ||
        col("series_id").startsWith("lang_match")))
    val dense = GapFill.locf(GapFill.densify(
      continuous.withColumn("bucket", col("hour_rank").cast("long")),
      Seq("series_id"), "bucket", "value"), Seq("series_id"), "bucket", "value", "v")
      .select(col("series_id"), col("bucket").as("hour_rank"), col("v").as("value"))
    val hourly = Tiers.hourly(
      dense.unionByName(sparse.select(col("series_id"), col("hour_rank"), col("value"))),
      "series_id", "hour_rank", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val daily = Tiers.rollup(hourly, "hourly", "daily")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3 actions, not one per tier: per-action plan/schedule overhead is
    // constant-vs-input, so extra actions directly poison the N-vs-4N
    // scaling signal at the hi level (weekly+flags share one job; both
    // read the materialized daily cache)
    val one = lit(1L).as("one")
    val pts = hourly.count() + daily.count() +
      Tiers.rollup(daily, "daily", "weekly").select(one)
        .unionAll(Tiers.anomalyFlags(daily).select(one)).count()
    series.unpersist(); hourly.unpersist(); daily.unpersist()
    pts
  }

  def timed(spark: SparkSession, dir: String, tag: String): Double = {
    val t0 = System.nanoTime()
    val pts = pipeline(spark, dir)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $tag pts=$pts sec=$sec%.1f pps=${(pts / sec).round}")
    pts / sec
  }

  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("PROBE_PAGES", "500000").toLong
    val dir = s"/tmp/probe_pages_$nPages"
    if (!new java.io.File(dir + "/_SUCCESS").exists()) {
      val s = session(16, 64)
      CrawlSynth.pages(s, nPages, math.max(1000, (nPages / 100).toInt), 64)
        .write.mode("overwrite").parquet(dir)
      s.stop()
    }
    val hiC = sys.env.getOrElse("PROBE_HI", "8").toInt
    val loC = sys.env.getOrElse("PROBE_LO", "2").toInt
    val sp = 64
    val hi = session(hiC, sp)
    timed(hi, dir, s"warm$hiC"); val pHi = timed(hi, dir, s"hi$hiC")
    hi.stop()
    val lo = session(loC, sp)
    timed(lo, dir, s"warm$loC"); val pLo = timed(lo, dir, s"lo$loC")
    lo.stop()
    println(f"[probe] cores $loC->$hiC efficiency=${pHi / pLo / (hiC.toDouble / loC)}%.3f")
  }
}
