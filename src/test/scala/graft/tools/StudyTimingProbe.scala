package graft.tools

import graft.ctas._
import org.apache.spark.sql.SparkSession

/** Manual timing probe (Test/runMain graft.tools.StudyTimingProbe <sfDir>
  * [cores]) for the bench-scale ctas study: where does the study block's
  * wall-clock go — relational autogen vs the legacy kernel path vs the
  * full pipeline. Not part of the suite.
  */
object StudyTimingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val in = graft.queries.StudyQueries.studyInput(spark, sfDir)
    val cfg = CtasConfig()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm up parquet footers + JIT
    in.data.count()

    val coverage = t("coverage-build") {
      val c = in.data
        .filter(org.apache.spark.sql.functions.col("result").isNotNull)
        .withColumn("has_baseline_value", org.apache.spark.sql.functions.lit("No"))
        .select("parameter_id", "subject_id", "timepoint_rank", "has_baseline_value")
        .distinct()
      c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }
    val params = in.parameters
      .withColumn("time_point_count_min", org.apache.spark.sql.functions.lit(3.0))
      .withColumn("subject_count_min", org.apache.spark.sql.functions.lit(3.0))
      .withColumn("max_share_missing", org.apache.spark.sql.functions.lit(0.5))
      .withColumn("generate_change_from_baseline", org.apache.spark.sql.functions.lit(false))
      .withColumn("use_only_custom_timeseries", org.apache.spark.sql.functions.lit(false))

    for (i <- 1 to 2) {
      t(s"relational-autogen-defs+mem-$i") {
        val (d, m) = SeriesGen.autogenerate(spark, coverage, params, in.subjects, cfg)
        (d.count(), m.count())
      }
      t(s"kernel-autogen-defs+mem-$i") {
        val (d, m) = SeriesGen.autogenerateKernelPath(spark, coverage, params, in.subjects, cfg)
        (d.count(), m.count())
      }
    }
    for (i <- 1 to 2) {
      t(s"full-processAStudy-$i") {
        val out = CtasPipeline.processAStudy(in, cfg).get
        Seq(out.timeseries, out.timeseriesFeatures, out.pcaCoordinates, out.siteScores)
          .map(_.count()).sum
      }
    }
    spark.stop()
  }
}
