package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming sessionization (VERDICT r04 "Next round" #5):
  * the same `session_window` aggregation runs in batch and streaming, so
  * the streaming-equals-batch invariant can be asserted end-to-end
  * through a real StreamingQuery — the same shape as the hourly tier's
  * `q_stream_hourly_tier`.
  *
  * Boundary semantics: `session_window` merges an event into the open
  * session while `t − prev < gap` (STRICT — the event's window
  * [t, t+gap) must overlap the session), whereas the batch
  * [[graft.rollup.Sessionize]] breaks on `t − prev > gap` (inclusive
  * merge). The two disagree only when a gap equals the threshold
  * exactly; oracles for this path use the strict form.
  */
object StreamingSessionize {

  /** Per-(key, session) stats via `session_window`, usable on batch AND
    * streaming frames: event count plus start/end as epoch-second
    * doubles (micro-exact, so DuckDB's `epoch()` compares bit-for-bit).
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      gapDuration: String): DataFrame =
    df
      .groupBy(col(keyCol), session_window(col(tsCol), gapDuration))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol).cast("double")).as("session_start"),
        max(col(tsCol).cast("double")).as("session_end"))
      .select(col(keyCol), col("n_events"),
        col("session_start"), col("session_end"))

  /** Drive a parquet-backed stream through the session aggregation into
    * an in-memory sink (complete mode: sessions are a running aggregate,
    * so no watermark is needed and the final table holds every closed
    * AND open session — identical to the batch result once the input is
    * exhausted).
    */
  def runFileStream(
      spark: SparkSession,
      dir: String,
      queryName: String,
      keyCol: String,
      tsCol: String,
      gapDuration: String,
      prepare: DataFrame => DataFrame = identity): StreamingQuery = {
    // input-sized state partitioning; sink readable via q.sparkSession
    // (see StreamingTier.streamSession)
    val s2 = graft.rollup.StreamingTier.streamSession(spark, dir)
    val schema = s2.read.parquet(dir).schema
    val stream = s2.readStream.schema(schema).parquet(dir)
    sessionStats(prepare(stream), keyCol, tsCol, gapDuration)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
