package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join: pair every left point `t` with the right
  * intervals `[lo, hi]` (inclusive both ends) on the same key — the
  * "which maintenance window / crawl campaign / rate-limit episode did
  * this event fall into" lookup. Spark plans a raw
  * `l.t BETWEEN r.lo AND r.hi` range predicate as a broadcast
  * nested-loop (or worse, a cartesian) — O(|L|·|R|) per key and a
  * guaranteed 100-TB casualty.
  *
  * Scale shape: bucketize. Each interval explodes into its coarse
  * buckets of width `bucketWidth` (fan-out = interval length / width),
  * each point maps to its single bucket, and the pairing becomes an
  * EQUI-join on (keys, bucket) followed by the exact bounds filter.
  * Because a point owns exactly one bucket, every qualifying
  * (point, interval) pair meets exactly once — no dedup pass. Cost is
  * one shuffle join; `bucketWidth` trades right-side fan-out against
  * candidate precision (pick ≈ the median interval length).
  * IntervalJoinSpec asserts the plan is a shuffle equi-join with no
  * BroadcastNestedLoopJoin/CartesianProduct; the driver oracle
  * `q_interval_join` pins results against DuckDB's BETWEEN join.
  *
  * Inner-join semantics: unmatched points and empty/inverted intervals
  * (lo > hi) drop out; intervals with null bounds are dropped.
  */
object IntervalJoin {

  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions =
      right.columns.filterNot(keys.contains).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"left and right share non-key columns: ${collisions.mkString(", ")} — alias them first")
    val t = TimeCols.epochSeconds(left, timeCol)
    val lo = TimeCols.epochSeconds(right, loCol)
    val hi = TimeCols.epochSeconds(right, hiCol)

    val pts = left.withColumn("__b", floor(t / bucketWidth).cast("long"))
    val ivs = right
      .filter(lo.isNotNull && hi.isNotNull && lo <= hi)
      .withColumn("__b",
        explode(sequence(floor(lo / bucketWidth).cast("long"),
          floor(hi / bucketWidth).cast("long"))))

    pts
      .join(ivs, keys :+ "__b")
      .filter(t >= lo && t <= hi)
      .drop("__b")
  }
}
