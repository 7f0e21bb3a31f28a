package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot keys (north_rule: hot hosts at
  * 10^12-row derivation).
  *
  * For ALGEBRAIC aggregations Spark's hash aggregate already does
  * map-side partial aggregation, which absorbs most key skew. Salting
  * matters when the aggregation is NOT partially aggregatable on the map
  * side (e.g. exact collect/distinct-heavy states) or when a downstream
  * stage keys on the hot column: saltedAgg does the classic two-phase
  * (key, salt) partial -> key final merge; saltBroadcastJoin replicates
  * the small side per salt so a skewed join key spreads over `salt`
  * tasks. Matrix kernels (one series = one task) instead CAP group size
  * with deterministic sampling — see CtasPipeline.maxKernelSubjects.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on (keys, salt)
    * — spreading a hot key over `salt` tasks — phase 2 merges the
    * partial states. Caller provides both phases' agg columns (partial
    * state in, merged state out).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      saltBy: Column,
      partialAggs: Seq[Column],
      mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltBy), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Convenience: salted (count, sum, min, max, sumsq) — the tier state. */
  def saltedTierState(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBy: Column, saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets, saltBy,
      partialAggs = Seq(
        count(col(valueCol)).as("n"),
        sum(col(valueCol)).as("sum"),
        sum(col(valueCol) * col(valueCol)).as("sumsq"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max")),
      mergeAggs = Seq(
        sum(col("n")).as("n"),
        sum(col("sum")).as("sum"),
        sum(col("sumsq")).as("sumsq"),
        min(col("min")).as("min"),
        max(col("max")).as("max")))

  /** Deterministic per-group downsampling predicate: keep a row iff its
    * hash falls under cap/groupSize. Used to bound one-task matrix
    * kernels (a series' m×m distance matrix must fit one task —
    * SURVEY.md §7.4.6).
    */
  def sampleWithinCap(hashCol: Column, groupSize: Column, cap: Int): Column =
    (groupSize <= cap) ||
      (pmod(xxhash64(hashCol), lit(1000000)) * groupSize < lit(cap.toLong * 1000000L))
}
