package graft.queries

import graft.Q
import graft.rollup.{GapFill, Tiers}
import graft.util.T
import org.apache.spark.sql.functions._

/** Rollup-engine operators driver-verified over events: tier building
  * (algebraic state re-aggregation), gap-fill, and the Gorilla codec
  * round-trip — all running the actual engine code (graft.rollup.*)
  * against closed-form DuckDB SQL.
  */
object RollupQueries {

  private val epoch20240101 = 1704067200L

  /** events -> (series_id = event_type|user bucket, hour_rank, value) */
  private def eventSeries(s: org.apache.spark.sql.SparkSession, d: String) =
    T.events(s, d).select(
      concat(col("event_type"), lit("|"), (col("user_id") % 10)).as("series_id"),
      floor((unix_timestamp(col("ts")) - epoch20240101) / 3600L).as("hour_rank"),
      col("value"))

  private val eventSeriesSql =
    """SELECT event_type || '|' || CAST(user_id % 10 AS VARCHAR) AS series_id,
      |  CAST(floor((epoch(ts) - 1704067200) / 3600) AS BIGINT) AS hour_rank,
      |  value
      |FROM events""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      // hourly tier: algebraic per-bucket state
      "q_tier_hourly",
      (s, d) => Tiers.hourly(eventSeries(s, d), "series_id", "hour_rank", "value"),
      Some(s"""WITH es AS ($eventSeriesSql)
              |SELECT series_id, hour_rank AS bucket,
              |  count(value) AS n, sum(value) AS sum,
              |  sum(value * value) AS sumsq,
              |  min(value) AS min, max(value) AS max
              |FROM es GROUP BY 1, 2""".stripMargin)
    ),
    Q(
      // daily tier BUILT BY RE-AGGREGATING the hourly tier — verified
      // against direct daily aggregation in DuckDB (the continuous-
      // aggregate invariant)
      "q_tier_daily_from_hourly",
      (s, d) => {
        val hourly = Tiers.hourly(eventSeries(s, d), "series_id", "hour_rank", "value")
        Tiers.withDerived(Tiers.rollup(hourly, "hourly", "daily"))
          .select(col("series_id"), col("bucket"), col("n"),
            round(col("sum"), 6).as("sum"),
            round(col("avg"), 6).as("avg"),
            col("min"), col("max"))
      },
      Some(s"""WITH es AS ($eventSeriesSql)
              |SELECT series_id,
              |  CAST(floor(hour_rank / 24) AS BIGINT) AS bucket,
              |  count(value) AS n,
              |  round(sum(value), 6) AS sum,
              |  round(sum(value) / count(value), 6) AS avg,
              |  min(value) AS min, max(value) AS max
              |FROM es GROUP BY 1, 2""".stripMargin)
    ),
    Q(
      // densify + LOCF gap-fill (north_rule): engine windows vs DuckDB
      // generate_series + IGNORE NULLS window
      "q_gapfill_locf",
      (s, d) => {
        val daily = T.events(s, d)
          .filter(col("user_id") < 30)
          .select(col("user_id"),
            floor((unix_timestamp(col("ts")) - epoch20240101) / 86400L).as("bucket"),
            col("value"))
          .groupBy("user_id", "bucket").agg(avg(col("value")).as("v"))
        val dense = GapFill.densify(daily, Seq("user_id"), "bucket", "v")
        GapFill.locf(dense, Seq("user_id"), "bucket", "v", "v_filled")
          .select(col("user_id"), col("bucket"), round(col("v_filled"), 6).as("v_filled"))
      },
      Some("""WITH daily AS (
             |  SELECT user_id,
             |    CAST(floor((epoch(ts) - 1704067200) / 86400) AS BIGINT) AS bucket,
             |    avg(value) AS v
             |  FROM events WHERE user_id < 30 GROUP BY 1, 2),
             |grid AS (
             |  SELECT user_id, unnest(generate_series(min(bucket), max(bucket))) AS bucket
             |  FROM daily GROUP BY user_id),
             |dense AS (
             |  SELECT g.user_id, g.bucket, d.v
             |  FROM grid g LEFT JOIN daily d USING (user_id, bucket))
             |SELECT user_id, bucket,
             |  round(last_value(v IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
             |FROM dense""".stripMargin)
    ),
    Q(
      // linear interpolation gap-fill: engine vs closed-form SQL
      "q_gapfill_linear",
      (s, d) => {
        val daily = T.events(s, d)
          .filter(col("user_id") < 30)
          .select(col("user_id"),
            floor((unix_timestamp(col("ts")) - epoch20240101) / 86400L).as("bucket"),
            col("value"))
          .groupBy("user_id", "bucket").agg(avg(col("value")).as("v"))
        val dense = GapFill.densify(daily, Seq("user_id"), "bucket", "v")
        GapFill.linear(dense, Seq("user_id"), "bucket", "v", "v_filled")
          .select(col("user_id"), col("bucket"), round(col("v_filled"), 6).as("v_filled"))
      },
      Some("""WITH daily AS (
             |  SELECT user_id,
             |    CAST(floor((epoch(ts) - 1704067200) / 86400) AS BIGINT) AS bucket,
             |    avg(value) AS v
             |  FROM events WHERE user_id < 30 GROUP BY 1, 2),
             |grid AS (
             |  SELECT user_id, unnest(generate_series(min(bucket), max(bucket))) AS bucket
             |  FROM daily GROUP BY user_id),
             |dense AS (
             |  SELECT g.user_id, g.bucket, d.v
             |  FROM grid g LEFT JOIN daily d USING (user_id, bucket)),
             |ctx AS (
             |  SELECT user_id, bucket, v,
             |    last_value(v IGNORE NULLS) OVER w_prev AS pv,
             |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
             |      OVER w_prev AS pb,
             |    first_value(v IGNORE NULLS) OVER w_next AS nv,
             |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
             |      OVER w_next AS nb
             |  FROM dense
             |  WINDOW
             |    w_prev AS (PARTITION BY user_id ORDER BY bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    w_next AS (PARTITION BY user_id ORDER BY bucket
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, bucket,
             |  round(CASE
             |    WHEN v IS NOT NULL THEN v
             |    WHEN pv IS NOT NULL AND nv IS NOT NULL
             |      THEN pv + (nv - pv) * (bucket - pb) / (nb - pb)
             |    WHEN pv IS NOT NULL THEN pv
             |    ELSE nv END, 6) AS v_filled
             |FROM ctx""".stripMargin)
    ),
    Q(
      // Gorilla chunk encode -> decode round-trip of the daily tier,
      // verified against the directly-aggregated points in DuckDB
      "q_gorilla_roundtrip",
      (s, d) => {
        val hourly = Tiers.hourly(eventSeries(s, d), "series_id", "hour_rank", "value")
        val daily = Tiers.rollup(hourly, "hourly", "daily")
        Tiers.decompressChunks(Tiers.compressChunks(daily))
          .select(col("series_id"), col("bucket"), round(col("avg"), 6).as("avg"))
      },
      Some(s"""WITH es AS ($eventSeriesSql)
              |SELECT series_id,
              |  CAST(floor(hour_rank / 24) AS BIGINT) AS bucket,
              |  round(sum(value) / count(value), 6) AS avg
              |FROM es GROUP BY 1, 2""".stripMargin)
    ),
    Q(
      // per-series anomaly screen over the daily tier (rows-only check:
      // thresholds are engine-specific; correctness covered by TiersSpec)
      "q_tier_anomaly_flags",
      (s, d) => {
        val hourly = Tiers.hourly(eventSeries(s, d), "series_id", "hour_rank", "value")
        Tiers.anomalyFlags(Tiers.rollup(hourly, "hourly", "daily"))
      },
      None
    )
  )
}
