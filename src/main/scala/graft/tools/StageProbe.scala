package graft.tools

import graft.rollup._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage wall-clock breakdown of the rollup pipeline (dev tool).
  * PROBE_DIR selects the materialized pages table, PROBE_CORES a
  * comma-separated list of local[k] levels (fresh session per level).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/probe_pages_500000")
    val levels = sys.env.getOrElse("PROBE_CORES", "4,1")
      .split(",").toSeq.map(_.trim.toInt)
    for (cores <- levels) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", math.max(cores * 2, 8).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def t[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[stage] c$cores $l ${(System.nanoTime()-t0)/1e9}%.1fs"); r
      }
      // warm
      spark.read.parquet(dir).agg(count(lit(1))).collect()
      val pages = spark.read.parquet(dir)
      t("scan")(pages.agg(count(col("url"))).collect())
      val series = SeriesDerive.hostSeriesRich(pages)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("derive")(series.count())
      val continuous = series.filter(col("series_id").startsWith("text_length") ||
        col("series_id").startsWith("quality") || col("series_id").startsWith("lang_match"))
      val dense = GapFill.densifyLocf(
        continuous.withColumn("bucket", col("hour_rank").cast("long")),
        Seq("series_id"), "bucket", "value", "v")
      t("densify+locf")(dense.count())
      val hourly = Tiers.hourly(dense.select(col("series_id"),
        col("bucket").as("hour_rank"), col("v").as("value")), "series_id", "hour_rank", "value")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("hourly")(hourly.count())
      val daily = Tiers.rollup(hourly, "hourly", "daily")
      t("daily")(daily.count())
      t("flags")(Tiers.anomalyFlags(daily).count())
      series.unpersist(); hourly.unpersist()
      spark.stop()
    }
  }
}
