package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-area registries (graft.queries.*); each
  * entry is a Spark implementation plus, where SQL-expressible, a DuckDB
  * oracle over the same parquet tables.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    graft.queries.RelationalQueries.all ++
      graft.queries.CtasQueries.all ++
      graft.queries.RollupQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupAnnQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the full ctas study pipeline (validate -> series autogen ->
    * features -> KS site scores with study-wide FDR) over the events
    * table mapped to the ctas shape (user -> subject, event_type ->
    * parameter, day bucket -> timepoint_rank).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val events = spark.read.parquet(s"$d/events.parquet")
    val fact = events.select(
      col("user_id").cast("string").as("subject_id"),
      col("event_type").as("parameter_id"),
      concat(lit("d"), floor((unix_timestamp(col("ts")) - 1704067200L) / 86400L))
        .as("timepoint_1_name"),
      lit(null).cast("string").as("timepoint_2_name"),
      floor((unix_timestamp(col("ts")) - 1704067200L) / 86400L).cast("double")
        .as("timepoint_rank"),
      col("value").as("result"),
      lit(null).cast("double").as("baseline"))
    val subjects = events.select(col("user_id").cast("string").as("subject_id")).distinct()
      .withColumn("site", concat(lit("site"), pmod(col("subject_id").cast("long"), lit(8))))
      .withColumn("country", concat(lit("c"), pmod(col("subject_id").cast("long"), lit(3))))
      .withColumn("region", lit("r1"))
    val parameters = events.select(col("event_type").as("parameter_id")).distinct()
      .select(col("parameter_id"), col("parameter_id").as("parameter_name"),
        lit(null).cast("string").as("parameter_category_1"),
        lit(null).cast("string").as("parameter_category_2"),
        lit(null).cast("string").as("parameter_category_3"),
        lit(null).cast("double").as("time_point_count_min"),
        lit(null).cast("double").as("subject_count_min"),
        lit(null).cast("double").as("max_share_missing"),
        lit(null).cast("boolean").as("generate_change_from_baseline"),
        lit(null).cast("string").as("timeseries_features_to_calculate"),
        lit(null).cast("boolean").as("use_only_custom_timeseries"))
    val emptyTs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("timeseries_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("parameter_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("timepoint_combo",
          org.apache.spark.sql.types.StringType))))
    val emptyRg = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("parameter_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("feature",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ref_group",
          org.apache.spark.sql.types.StringType))))
    val out = graft.ctas.CtasPipeline.processAStudy(
      graft.ctas.CtasInput(subjects, parameters, fact, emptyTs, emptyRg),
      graft.ctas.CtasConfig(
        defaultMinTimepoints = 3, defaultMinSubjects = 3,
        defaultMaxShareMissing = 0.9))
    out.get.siteScores
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
