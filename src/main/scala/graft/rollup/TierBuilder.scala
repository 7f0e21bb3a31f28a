package graft.rollup

import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end tier build with per-partition lineage + metrics and
  * snapshot-level resume (north_rule): pages are processed one day
  * partition at a time; each completed partition is committed to the
  * snapshot store, so a killed job restarted with resume=true skips
  * everything already committed and continues from the first missing
  * partition.
  */
object TierBuilder {

  case class BuildReport(
      builtPartitions: Seq[String],
      skippedPartitions: Seq[String],
      totalPoints: Long)

  /** Build the hourly tier of per-(host,metric) series from a pages table,
    * partitioned by crawl day. `failAfter` injects a crash after N
    * partitions (for the kill/resume test).
    */
  def buildHourly(
      spark: SparkSession,
      pages: DataFrame,
      storeRoot: String,
      resume: Boolean = true,
      failAfter: Int = Int.MaxValue): BuildReport = {

    val store = new SnapshotStore(storeRoot)
    val committed = if (resume) store.committedPartitions() else Set.empty[String]

    val withDay = pages.withColumn("day", date_format(col("warc_ts"), "yyyy-MM-dd"))
    val days = withDay.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0)).toSeq

    val built = collection.mutable.ArrayBuffer.empty[String]
    val skipped = collection.mutable.ArrayBuffer.empty[String]
    var totalPoints = 0L
    var done = 0

    days.foreach { day =>
      val part = s"day=$day"
      if (committed.contains(part)) {
        skipped += part
      } else {
        if (done >= failAfter)
          throw new RuntimeException(s"injected failure before $part")
        val dayPages = withDay.filter(col("day") === day)
        val series = SeriesDerive.hostSeries(dayPages)
        val tier = Tiers.hourly(series, "series_id", "hour_rank", "value")
        val outPath = store.dataPath(part)
        tier.write.mode("overwrite").parquet(outPath)
        val rows = spark.read.parquet(outPath).count()
        totalPoints += rows
        store.commit(Seq(store.PartitionEntry(
          name = part,
          rows = rows,
          metrics = Map("points" -> rows.toString),
          lineage = s"pages[day=$day] -> SeriesDerive.series -> Tiers.hourly")))
        built += part
        done += 1
      }
    }
    BuildReport(built.toSeq, skipped.toSeq, totalPoints)
  }

  /** Read the committed hourly tier back as one DataFrame. */
  def readHourly(spark: SparkSession, storeRoot: String): DataFrame = {
    val store = new SnapshotStore(storeRoot)
    val parts = store.committedPartitions().toSeq.sorted
    require(parts.nonEmpty, "no committed partitions")
    val dfs = parts.map(p => spark.read.parquet(store.dataPath(p)))
    dfs.reduce(_ unionByName _)
  }
}
