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
      graft.queries.StudyQueries.all ++
      graft.queries.RollupQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupAnnQueries.all ++
      graft.queries.MultimodalQueries.all ++
      graft.queries.SketchQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the full ctas study pipeline (validate -> series autogen ->
    * features -> KS site scores with study-wide FDR) over the events
    * table mapped to the ctas shape (user -> subject, event_type ->
    * parameter, day bucket -> timepoint_rank).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.StudyQueries.study(spark, "/root/testdata/sf0.001").siteScores

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
