package graft.tools

import graft.ctas._
import graft.rollup._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end demo drive: synthetic crawl -> derived series -> full ctas
  * pipeline -> tier rollup + anomaly flags. Prints row counts and samples.
  */
object E2eDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pages = CrawlSynth.pages(spark, 20000, nHosts = 60, numPartitions = 8).cache()
    println(s"pages=${pages.count()}")

    def emptyDf(fields: String*) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(fields.map(f => StructField(f, StringType))))

    val in = CtasInput(
      subjects = SeriesDerive.hosts(pages),
      parameters = SeriesDerive.parameters(spark),
      data = SeriesDerive.series(pages),
      customTimeseries = emptyDf("timeseries_id", "parameter_id", "timepoint_combo"),
      customReferenceGroups = emptyDf("parameter_id", "feature", "ref_group"))

    val cfg = CtasConfig(defaultMinTimepoints = 24, defaultMinSubjects = 3,
      defaultMaxShareMissing = 0.9)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label ${(System.nanoTime()-t0)/1e9}%.1fs"); r
    }
    println(s"series rows=${t("series count")(in.data.count())}")
    val out = t("processAStudy")(CtasPipeline.processAStudy(in, cfg).get)
    println(s"timeseries=${t("ts")(out.timeseries.count())} features=${t("feat")(out.timeseriesFeatures.count())} " +
      s"pca=${t("pca")(out.pcaCoordinates.count())} siteScores=${t("scores")(out.siteScores.count())}")
    out.timeseries.show(5, false)
    out.siteScores.orderBy(col("fdr_corrected_pvalue_logp").desc).show(8, false)

    val series = SeriesDerive.hostSeries(pages)
    val hourly = Tiers.hourly(series, "series_id", "hour_rank", "value")
    val daily = Tiers.rollup(hourly, "hourly", "daily")
    val weekly = Tiers.rollup(daily, "daily", "weekly")
    println(s"tiers: hourly=${hourly.count()} daily=${daily.count()} weekly=${weekly.count()}")
    val flags = Tiers.anomalyFlags(hourly)
    flags.filter(col("flag_zigzag") || col("flag_repeated_values") || col("flag_spike"))
      .show(10, false)
    spark.stop()
  }
}
