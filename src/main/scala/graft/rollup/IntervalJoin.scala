package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval joins as bucketized equi-joins. Spark plans a raw range
  * predicate (`l.t BETWEEN r.lo AND r.hi`, or `l.lo <= r.hi AND r.lo <=
  * l.hi`) as a broadcast nested-loop (or worse, a cartesian) —
  * O(|L|·|R|) per key and a guaranteed 100-TB casualty.
  *
  * Scale shape: bucketize. Each interval explodes into its coarse
  * buckets of width `bucketWidth` (fan-out = interval length / width),
  * each point maps to its single bucket, and the pairing becomes an
  * EQUI-join on (keys, bucket) followed by the exact bounds filter.
  * Cost is one shuffle join; `bucketWidth` trades interval fan-out
  * against candidate precision (pick ≈ the median interval length).
  * IntervalJoinSpec asserts the plans are shuffle equi-joins with no
  * BroadcastNestedLoopJoin/CartesianProduct; driver oracles
  * `q_interval_join` / `q_interval_overlap` pin results against DuckDB
  * range joins.
  *
  * Pair-meets-once: a point owns exactly one bucket, so
  * [[pointInInterval]] needs no dedup. For [[intervalOverlap]] a
  * qualifying pair shares every bucket in the overlap range; the pair is
  * OWNED by the bucket of `max(lo_left, lo_right)` — that bucket is in
  * both sides' bucket lists whenever the intervals overlap (max(lo) ≤
  * min(hi) ≤ either hi), so filtering the joined pair to its owner
  * bucket keeps each pair exactly once with no distinct pass.
  *
  * Fan-out guard (ADVICE r04): one corrupt or open-ended interval much
  * longer than `bucketWidth` would explode into up to Spark's max array
  * length of buckets, OOMing a task with no diagnostic. Intervals
  * fanning out beyond `maxFanout` buckets fail the job with an
  * actionable message instead.
  *
  * Inner-join semantics: unmatched rows and empty/inverted intervals
  * (lo > hi) drop out; intervals with null bounds are dropped.
  */
object IntervalJoin {

  /** explode an interval frame into (row, __b) per covered bucket, with
    * the fan-out guard.
    */
  private def explodeBuckets(
      df: DataFrame, lo: Column, hi: Column, bucketWidth: Double,
      maxFanout: Long, side: String): DataFrame = {
    val bLo = floor(lo / bucketWidth).cast("long")
    val bHi = floor(hi / bucketWidth).cast("long")
    val fanout = bHi - bLo + lit(1L)
    df.filter(lo.isNotNull && hi.isNotNull && lo <= hi)
      .withColumn("__b", explode(
        when(fanout > maxFanout,
          raise_error(format_string(
            s"IntervalJoin: a $side interval spans %d buckets of width " +
              s"$bucketWidth (maxFanout=$maxFanout) — pick a larger " +
              "bucketWidth or cap/clean interval lengths upstream",
            fanout)))
          .otherwise(sequence(bLo, bHi))))
  }

  /** Pair every left point `t` with the right intervals `[lo, hi]`
    * (inclusive both ends) on the same key — the "which maintenance
    * window / crawl campaign / rate-limit episode did this event fall
    * into" lookup.
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxFanout: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions =
      right.columns.filterNot(keys.contains).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"left and right share non-key columns: ${collisions.mkString(", ")} — alias them first")
    val t = TimeCols.epochSeconds(left, timeCol)
    val lo = TimeCols.epochSeconds(right, loCol)
    val hi = TimeCols.epochSeconds(right, hiCol)

    val pts = left.withColumn("__b", floor(t / bucketWidth).cast("long"))
    val ivs = explodeBuckets(right, lo, hi, bucketWidth, maxFanout, "right")

    pts
      .join(ivs, keys :+ "__b")
      .filter(t >= lo && t <= hi)
      .drop("__b")
  }

  /** Pair every left interval `[lo1, hi1]` with the right intervals
    * `[lo2, hi2]` that OVERLAP it on the same key (inclusive ends:
    * `lo1 <= hi2 AND lo2 <= hi1`) — session-vs-outage overlap, crawl
    * campaign dedup, training-window shaping. Each qualifying pair is
    * emitted exactly once (owner-bucket trick, see object doc).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lo1Col: String,
      hi1Col: String,
      lo2Col: String,
      hi2Col: String,
      bucketWidth: Double,
      maxFanout: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions =
      right.columns.filterNot(keys.contains).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"left and right share non-key columns: ${collisions.mkString(", ")} — alias them first")
    val lo1 = TimeCols.epochSeconds(left, lo1Col)
    val hi1 = TimeCols.epochSeconds(left, hi1Col)
    val lo2 = TimeCols.epochSeconds(right, lo2Col)
    val hi2 = TimeCols.epochSeconds(right, hi2Col)

    val l = explodeBuckets(left, lo1, hi1, bucketWidth, maxFanout, "left")
    val r = explodeBuckets(right, lo2, hi2, bucketWidth, maxFanout, "right")

    l.join(r, keys :+ "__b")
      .filter(lo1 <= hi2 && lo2 <= hi1)
      // owner bucket: max(lo1, lo2) lies inside both intervals whenever
      // they overlap, so exactly one of the shared buckets keeps the pair
      .filter(col("__b") === floor(greatest(lo1, lo2) / bucketWidth).cast("long"))
      .drop("__b")
  }
}
