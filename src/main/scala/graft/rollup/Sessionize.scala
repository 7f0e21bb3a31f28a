package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each key's events into sessions that
  * break when the gap to the previous event exceeds `gap` (units of the
  * time column). The batch analogue of Structured Streaming's
  * `session_window`, and the standard way to turn raw event/crawl logs
  * into per-visit training examples.
  *
  * Plan shape: one window pass per key — lag to flag session starts,
  * running sum to number them (both over the same (key, time) sort, so
  * ONE exchange + sort total; SessionizeSpec asserts it). Rows tied on
  * (key, time) always land in the same session whatever their sort
  * order, because their gap is 0.
  */
object Sessionize {

  /** Adds `outCol`: a per-key 0-based session index. */
  def assign(df: DataFrame, keys: Seq[String], timeCol: String, gap: Double,
      outCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__prev_t", lag(col(timeCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev_t").isNull ||
          col(timeCol).cast("double") - col("__prev_t").cast("double") > gap, 1L)
          .otherwise(0L))
      .withColumn(outCol, sum(col("__new")).over(wCum) - 1)
      .drop("__prev_t", "__new")
  }

  /** Per-(key, session) summary: event count, start, end, duration. */
  def stats(df: DataFrame, keys: Seq[String], timeCol: String, gap: Double): DataFrame =
    assign(df, keys, timeCol, gap)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).cast("double").as("session_start"),
        max(col(timeCol)).cast("double").as("session_end"))
      .withColumn("duration", col("session_end") - col("session_start"))
}
