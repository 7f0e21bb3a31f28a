package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.rollup.Tiers
import graft.sketch.HeavyHitters
import graft.util.T

/** Driver queries for the bounded-state sketch operators: the HLL
  * distinct-cardinality tier (the continuous-aggregate state for COUNT
  * DISTINCT, which has no exact algebraic partial) and exact two-pass
  * heavy hitters (Misra-Gries candidates + candidate-only recount).
  */
object SketchQueries {

  private val epoch20240101 = 1704067200L

  /** events mapped to (series=event_type, hour_rank, item=user_id):
    * "distinct users per host-hour" in the north-rule reading.
    */
  private def userPoints(s: org.apache.spark.sql.SparkSession, d: String) =
    T.events(s, d).select(
      col("event_type").as("series_id"),
      floor((unix_timestamp(col("ts")) - epoch20240101) / 3600L).as("hour_rank"),
      col("user_id").as("item"))

  val all: Seq[Q] = Seq(
    Q(
      // HLL distinct tier with the continuous-aggregate invariant made
      // a driver oracle: the DAILY estimate obtained by UNION-MERGING
      // hourly sketches AND the estimate of a sketch built directly
      // over the day must BOTH land within 5% of the exact distinct
      // count (merged_within_5pct = direct_within_5pct = 1; the union
      // preserves the sketch's error bound — estimates are only
      // bound-equivalent, not bit-equal, across merge topologies, see
      // Tiers scaladoc; 5% is >= 3 sigma of the 1.6% dense-mode
      // standard error at lgK=12, and these cardinalities are in the
      // exact sparse regime anyway). exact_distinct itself is
      // DuckDB-checked value-for-value; the exact countDistinct is
      // oracle INSTRUMENTATION — the scale path is the sketch chain,
      // whose per-bucket state is a fixed <=2^lgK bytes however hot
      // the host.
      "q_tier_distinct_hll",
      (s, d) => {
        val pts = userPoints(s, d)
        val hourly = Tiers.distinctHourly(pts, "series_id", "hour_rank", "item")
        val merged = Tiers.withDistinctEstimate(
          Tiers.rollupDistinct(hourly, "hourly", "daily"))
          .select(col("series_id"), col("bucket"),
            col("distinct_est").as("est_merged"))
        val direct = Tiers.withDistinctEstimate(
          Tiers.distinctHourly(
            pts.withColumn("day_rank", floor(col("hour_rank") / 24)),
            "series_id", "day_rank", "item"))
          .select(col("series_id"), col("bucket"),
            col("distinct_est").as("est_direct"))
        val exact = pts
          .groupBy(col("series_id"), floor(col("hour_rank") / 24).as("bucket"))
          .agg(countDistinct(col("item")).as("exact_distinct"))
        merged.join(direct, Seq("series_id", "bucket"))
          .join(exact, Seq("series_id", "bucket"))
          .select(
            col("series_id"), col("bucket"), col("exact_distinct"),
            (abs(col("est_merged") - col("exact_distinct")) <=
              col("exact_distinct") * 0.05).cast("int")
              .as("merged_within_5pct"),
            (abs(col("est_direct") - col("exact_distinct")) <=
              col("exact_distinct") * 0.05).cast("int")
              .as("direct_within_5pct"))
      },
      Some("""SELECT event_type AS series_id,
             |  CAST(floor(floor((epoch(ts) - 1704067200) / 3600) / 24) AS BIGINT)
             |    AS bucket,
             |  count(DISTINCT user_id) AS exact_distinct,
             |  1 AS merged_within_5pct, 1 AS direct_within_5pct
             |FROM events GROUP BY 1, 2""".stripMargin)
    ),
    Q(
      // exact heavy hitters over a deterministically skewed item stream:
      // every 7th event is the hot key (~14.3% share), the rest spread
      // over ~100 keys (~0.86% each); k=10 (threshold: share > 10%)
      // must return EXACTLY the hot key with its exact count — DuckDB
      // recomputes the full group-by + HAVING. The Spark plan never
      // shuffles per-distinct-key rows: pass 1 is the mergeable
      // Misra-Gries summary (<=9 counters per partial), pass 2 recounts
      // only the candidates behind a codegen'd isin filter.
      "q_heavy_hitters",
      (s, d) => {
        val items = T.events(s, d).select(
          when(col("event_id") % 7 === 0, lit("hot"))
            .otherwise(concat(col("event_type"), lit("|"),
              col("user_id") % 20)).as("item"))
        HeavyHitters.exactOverThreshold(items, "item", 10)
      },
      Some("""WITH it AS (
             |  SELECT CASE WHEN event_id % 7 = 0 THEN 'hot'
             |    ELSE event_type || '|' || CAST(user_id % 20 AS VARCHAR)
             |  END AS item FROM events)
             |SELECT item, count(*) AS cnt,
             |  (SELECT count(*) FROM it) AS n_total
             |FROM it GROUP BY 1
             |HAVING count(*) * 10 > (SELECT count(*) FROM it)""".stripMargin)
    )
  )
}
