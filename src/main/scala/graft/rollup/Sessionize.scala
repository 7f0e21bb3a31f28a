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
  *
  * Hot-key bound: one key's events sort in one task (any keyed
  * construction forces that placement). The sort spills and the
  * lag+cumsum frames carry O(1) state, so a hot key degrades to disk
  * instead of OOMing — SkewSpec drives a 10⁷-row single key through
  * this path. See AsOfJoin's scaladoc for the two-level-carry
  * refinement if a key ever exceeds task disk.
  */
object Sessionize {

  /** Adds `outCol`: a per-key 0-based session index. */
  def assign(df: DataFrame, keys: Seq[String], timeCol: String, gap: Double,
      outCol: String = "session_id"): DataFrame = {
    val t = TimeCols.epochSeconds(df, timeCol) // timestamp inputs welcome
    val w = Window.partitionBy(keys.map(col): _*).orderBy(t)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__t", t)
      .withColumn("__prev_t", lag(col("__t"), 1).over(w))
      .withColumn("__new",
        when(col("__prev_t").isNull || col("__t") - col("__prev_t") > gap, 1L)
          .otherwise(0L))
      .withColumn(outCol, sum(col("__new")).over(wCum) - 1)
      .drop("__t", "__prev_t", "__new")
  }

  /** Per-(key, session) summary: event count, start, end, duration. */
  def stats(df: DataFrame, keys: Seq[String], timeCol: String, gap: Double): DataFrame = {
    val assigned = assign(df, keys, timeCol, gap)
    val t = TimeCols.epochSeconds(assigned, timeCol)
    assigned
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(t).as("session_start"),
        max(t).as("session_end"))
      .withColumn("duration", col("session_end") - col("session_start"))
  }
}
