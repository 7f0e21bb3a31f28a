package graft.queries

import graft.Q
import graft.ctas.SiteScoring
import graft.util.T
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ctas-pipeline operators driver-verified over the events table, mapped
  * to the ctas shape: user_id -> subject, event_type -> parameter,
  * day bucket of ts -> timepoint_rank, value -> result (TESTDATA.md).
  * Non-SQL-expressible kernels (LOF, PCA, KS, own-site AUROC) are covered
  * by ScalaTest parity/property suites instead (SURVEY.md §5.2).
  */
object CtasQueries {

  private val epoch20240101 = 1704067200L

  private def cells(s: org.apache.spark.sql.SparkSession, d: String) =
    T.events(s, d)
      .select(
        col("event_type").as("parameter_id"),
        col("user_id").as("subject_id"),
        floor((unix_timestamp(col("ts")) - epoch20240101) / 86400L).as("rank"),
        col("value"))
      .groupBy("parameter_id", "subject_id", "rank")
      .agg(avg(col("value")).as("v"))

  private val cellsSql =
    """SELECT event_type AS parameter_id, user_id AS subject_id,
      |  CAST(floor((epoch(ts) - 1704067200) / 86400) AS BIGINT) AS rank,
      |  avg(value) AS v
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      // coverage bitmap (R/ctas.R:69-73)
      "q_ts_coverage",
      (s, d) =>
        T.events(s, d).select(
          col("event_type").as("parameter_id"),
          col("user_id").as("subject_id"),
          floor((unix_timestamp(col("ts")) - epoch20240101) / 86400L).as("rank"))
          .distinct(),
      Some("""SELECT DISTINCT event_type AS parameter_id, user_id AS subject_id,
             |  CAST(floor((epoch(ts) - 1704067200) / 86400) AS BIGINT) AS rank
             |FROM events""".stripMargin)
    ),
    Q(
      // subject eligibility: >= ceil((1-max_missing) * n_ranks) buckets
      // covered (R/ctas.R:818-825 with max_share_missing = 0.5)
      "q_ts_eligibility",
      (s, d) => {
        val cov = T.events(s, d).select(
          col("event_type").as("parameter_id"),
          col("user_id").as("subject_id"),
          floor((unix_timestamp(col("ts")) - epoch20240101) / 86400L).as("rank"))
          .distinct()
        val nRanks = cov.groupBy("parameter_id")
          .agg(countDistinct(col("rank")).as("n_ranks"))
        cov.groupBy("parameter_id", "subject_id")
          .agg(count(lit(1)).as("measurement_count"))
          .join(nRanks, Seq("parameter_id"))
          .filter(col("measurement_count") >= ceil(lit(0.5) * col("n_ranks")))
          .select("parameter_id", "subject_id", "measurement_count")
      },
      Some("""WITH cov AS (
             |  SELECT DISTINCT event_type AS parameter_id, user_id AS subject_id,
             |    CAST(floor((epoch(ts) - 1704067200) / 86400) AS BIGINT) AS rank
             |  FROM events),
             |n AS (SELECT parameter_id, count(DISTINCT rank) AS n_ranks
             |      FROM cov GROUP BY 1)
             |SELECT c.parameter_id, c.subject_id,
             |  count(*) AS measurement_count
             |FROM cov c JOIN n USING (parameter_id)
             |GROUP BY c.parameter_id, c.subject_id, n.n_ranks
             |HAVING count(*) >= ceil(0.5 * n.n_ranks)""".stripMargin)
    ),
    Q(
      // scalar features over per-bucket means (R/ctas.R:616-652).
      // Bit-stability (VERDICT r01 "What's wrong" #1, round-2 hardening):
      // decimal rounding is NOT enough — avgs over n=16 cells land exactly
      // on 6dp half-boundaries (e.g. 34.1846875) where a +-1ulp summation-
      // order wobble flips the rounded digit (observed across DuckDB runs
      // of the SAME query). Fix: quantize cells to DYADIC rationals
      // (multiples of 2^-14). Those are exact in binary, so sum/sumsq over
      // <=2^8 cells stay inside the 53-bit exact budget and are order-
      // insensitive; sd comes from the explicit sum/sumsq formula (builtin
      // stddev is Welford — order-sensitive even on exact inputs). Both
      // engines then hold IDENTICAL doubles, so any driver rounding rule
      // hashes identically. Cell values p/(100n) can never equal a
      // boundary odd/2^15 (5-adic vs 2-adic denominators), so the floor
      // quantization itself is also wobble-proof.
      "q_ts_features",
      (s, d) => {
        val rc = cells(s, d)
          .withColumn("v", floor(col("v") * 16384 + 0.5) / 16384)
        rc.groupBy("parameter_id", "subject_id")
          .agg(
            count(col("v")).as("n"),
            sum(col("v")).as("s"),
            sum(col("v") * col("v")).as("ss"),
            (max(col("v")) - min(col("v"))).as("rng"),
            countDistinct(col("v")).as("nd"))
          .filter(col("n") >= 2)
          .select(col("parameter_id"), col("subject_id"),
            round(col("s") / col("n"), 6).as("average"),
            round(col("rng"), 6).as("range"),
            round(sqrt(greatest(lit(0.0),
              (col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))), 6)
              .as("sd"),
            round(col("nd") * lit(1.0) / col("n"), 6)
              .as("unique_value_count_relative"))
      },
      Some(s"""WITH cells0 AS ($cellsSql),
              |cells AS (SELECT parameter_id, subject_id, rank,
              |            floor(v * 16384 + 0.5) / 16384 AS v
              |          FROM cells0),
              |agg AS (
              |  SELECT parameter_id, subject_id,
              |    count(v) AS n, sum(v) AS s, sum(v * v) AS ss,
              |    max(v) - min(v) AS rng, count(DISTINCT v) AS nd
              |  FROM cells GROUP BY 1, 2)
              |SELECT parameter_id, subject_id,
              |  round(s / n, 6) AS average,
              |  round(rng, 6) AS range,
              |  round(sqrt(greatest(0, (ss - s * s / n) / (n - 1))), 6) AS sd,
              |  round(nd * 1.0 / n, 6) AS unique_value_count_relative
              |FROM agg WHERE n >= 2""".stripMargin)
    ),
    Q(
      // lag-1 autocorrelation over adjacent observed buckets
      // (calculate_autocorrelation, R/ctas.R:1197-1207)
      "q_ts_autocorr",
      (s, d) => {
        val w = Window.partitionBy("parameter_id", "subject_id").orderBy("rank")
        cells(s, d)
          .withColumn("prev_v", lag(col("v"), 1).over(w))
          .groupBy("parameter_id", "subject_id")
          .agg(corr(col("v"), col("prev_v")).as("autocorr"),
            count(col("prev_v")).as("n_pairs"))
          .filter(col("n_pairs") >= 10 && col("autocorr").isNotNull &&
            !isnan(col("autocorr")))
      },
      Some(s"""WITH cells AS ($cellsSql),
              |lagged AS (
              |  SELECT parameter_id, subject_id, v,
              |    lag(v) OVER (PARTITION BY parameter_id, subject_id ORDER BY rank) AS prev_v
              |  FROM cells)
              |SELECT parameter_id, subject_id,
              |  corr(v, prev_v) AS autocorr, count(prev_v) AS n_pairs
              |FROM lagged GROUP BY 1, 2
              |HAVING count(prev_v) >= 10 AND corr(v, prev_v) IS NOT NULL
              |  AND NOT isnan(corr(v, prev_v))""".stripMargin)
    ),
    Q(
      // study-wide Benjamini-Hochberg (p.adjust 'fdr', R/ctas.R:222) —
      // the engine's padjust window recipe vs the closed-form SQL
      "q_ts_bh_adjust",
      (s, d) => {
        val p = cells(s, d)
          .groupBy("parameter_id", "subject_id")
          .agg((((abs(col("subject_id")) % 97) + 1) / lit(100.0)).as("p"))
          .groupBy("parameter_id", "p").agg(count(lit(1)).as("n_subjects"))
        SiteScoring.padjust(p, "p", "p_adj", "fdr")
          .select(col("parameter_id"), col("p"), col("n_subjects"),
            round(col("p_adj"), 10).as("p_adj"))
      },
      Some("""WITH p AS (
             |  SELECT parameter_id, ((abs(subject_id) % 97) + 1) / 100.0 AS p,
             |    count(*) AS n_subjects
             |  FROM (SELECT event_type AS parameter_id, user_id AS subject_id
             |        FROM events GROUP BY 1, 2)
             |  GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, count(*) OVER () AS n,
             |    row_number() OVER (ORDER BY p DESC) AS rn
             |  FROM p)
             |SELECT parameter_id, p, n_subjects,
             |  round(least(1.0, min(p * n / (n - rn + 1)) OVER (
             |    ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 10)
             |    AS p_adj
             |FROM ranked""".stripMargin)
    ),
    Q(
      // p.adjust 'holm' — distributed prefix-max recipe vs closed-form
      // SQL (ascending cummax of (n−i+1)·p)
      "q_ts_holm_adjust",
      (s, d) => {
        val p = cells(s, d)
          .groupBy("parameter_id", "subject_id")
          .agg((((abs(col("subject_id")) % 97) + 1) / lit(100.0)).as("p"))
          .groupBy("parameter_id", "p").agg(count(lit(1)).as("n_subjects"))
        SiteScoring.padjust(p, "p", "p_adj", "holm")
          .select(col("parameter_id"), col("p"), col("n_subjects"),
            round(col("p_adj"), 10).as("p_adj"))
      },
      Some("""WITH p AS (
             |  SELECT parameter_id, ((abs(subject_id) % 97) + 1) / 100.0 AS p,
             |    count(*) AS n_subjects
             |  FROM (SELECT event_type AS parameter_id, user_id AS subject_id
             |        FROM events GROUP BY 1, 2)
             |  GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, count(*) OVER () AS n,
             |    row_number() OVER (ORDER BY p ASC) AS rn
             |  FROM p)
             |SELECT parameter_id, p, n_subjects,
             |  round(least(1.0, max(p * (n - rn + 1)) OVER (
             |    ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 10)
             |    AS p_adj
             |FROM ranked""".stripMargin)
    ),
    Q(
      // p.adjust 'hochberg' — distributed suffix-min recipe vs
      // closed-form SQL (descending cummin of k·p_(n−k+1))
      "q_ts_hochberg_adjust",
      (s, d) => {
        val p = cells(s, d)
          .groupBy("parameter_id", "subject_id")
          .agg((((abs(col("subject_id")) % 97) + 1) / lit(100.0)).as("p"))
          .groupBy("parameter_id", "p").agg(count(lit(1)).as("n_subjects"))
        SiteScoring.padjust(p, "p", "p_adj", "hochberg")
          .select(col("parameter_id"), col("p"), col("n_subjects"),
            round(col("p_adj"), 10).as("p_adj"))
      },
      Some("""WITH p AS (
             |  SELECT parameter_id, ((abs(subject_id) % 97) + 1) / 100.0 AS p,
             |    count(*) AS n_subjects
             |  FROM (SELECT event_type AS parameter_id, user_id AS subject_id
             |        FROM events GROUP BY 1, 2)
             |  GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, row_number() OVER (ORDER BY p DESC) AS rn
             |  FROM p)
             |SELECT parameter_id, p, n_subjects,
             |  round(least(1.0, min(p * rn) OVER (
             |    ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 10)
             |    AS p_adj
             |FROM ranked""".stripMargin)
    ),
    Q(
      // p.adjust 'BY' (Benjamini–Yekutieli) — BH factors scaled by the
      // harmonic number H_n, vs closed-form SQL
      "q_ts_by_adjust",
      (s, d) => {
        val p = cells(s, d)
          .groupBy("parameter_id", "subject_id")
          .agg((((abs(col("subject_id")) % 97) + 1) / lit(100.0)).as("p"))
          .groupBy("parameter_id", "p").agg(count(lit(1)).as("n_subjects"))
        SiteScoring.padjust(p, "p", "p_adj", "BY")
          .select(col("parameter_id"), col("p"), col("n_subjects"),
            round(col("p_adj"), 10).as("p_adj"))
      },
      Some("""WITH p AS (
             |  SELECT parameter_id, ((abs(subject_id) % 97) + 1) / 100.0 AS p,
             |    count(*) AS n_subjects
             |  FROM (SELECT event_type AS parameter_id, user_id AS subject_id
             |        FROM events GROUP BY 1, 2)
             |  GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, count(*) OVER () AS n,
             |    row_number() OVER (ORDER BY p DESC) AS rn
             |  FROM p),
             |h AS (
             |  SELECT sum(1.0 / CAST(rn AS DOUBLE)) AS hn FROM ranked)
             |SELECT parameter_id, p, n_subjects,
             |  round(least(1.0, min(p * hn * n / (n - rn + 1)) OVER (
             |    ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 10)
             |    AS p_adj
             |FROM ranked CROSS JOIN h""".stripMargin)
    ),
    Q(
      // p.adjust 'bonferroni' — n·p clipped at 1
      "q_ts_bonferroni_adjust",
      (s, d) => {
        val p = cells(s, d)
          .groupBy("parameter_id", "subject_id")
          .agg((((abs(col("subject_id")) % 97) + 1) / lit(100.0)).as("p"))
          .groupBy("parameter_id", "p").agg(count(lit(1)).as("n_subjects"))
        SiteScoring.padjust(p, "p", "p_adj", "bonferroni")
          .select(col("parameter_id"), col("p"), col("n_subjects"),
            round(col("p_adj"), 10).as("p_adj"))
      },
      Some("""WITH p AS (
             |  SELECT parameter_id, ((abs(subject_id) % 97) + 1) / 100.0 AS p,
             |    count(*) AS n_subjects
             |  FROM (SELECT event_type AS parameter_id, user_id AS subject_id
             |        FROM events GROUP BY 1, 2)
             |  GROUP BY 1, 2)
             |SELECT parameter_id, p, n_subjects,
             |  round(least(1.0, p * (count(*) OVER ())), 10) AS p_adj
             |FROM p""".stripMargin)
    ),
    Q(
      // Tukey-fence site signal (calculate_simple_site_feature_avgs,
      // R/ctas.R:1251-1275) with exact type-7 quantiles; "site" = user
      // bucket
      "q_ts_iqr_fence",
      (s, d) => {
        val siteAvg = cells(s, d)
          .withColumn("site", (col("subject_id") % 10).cast("string"))
          .groupBy("parameter_id", "site")
          .agg(avg(col("v")).as("avg_value"))
        val fences = siteAvg.groupBy("parameter_id")
          .agg(expr("percentile(avg_value, 0.25)").as("q1"),
            expr("percentile(avg_value, 0.75)").as("q3"))
        siteAvg.join(fences, Seq("parameter_id"))
          .withColumn("is_signal",
            when(col("avg_value") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
              col("avg_value") > col("q3") + lit(1.5) * (col("q3") - col("q1")),
              lit(1.0)).otherwise(lit(0.0)))
          .select("parameter_id", "site", "avg_value", "is_signal")
      },
      Some(s"""WITH cells AS ($cellsSql),
              |site_avg AS (
              |  SELECT parameter_id, CAST(subject_id % 10 AS VARCHAR) AS site,
              |    avg(v) AS avg_value
              |  FROM cells GROUP BY 1, 2),
              |fences AS (
              |  SELECT parameter_id,
              |    quantile_cont(avg_value, 0.25) AS q1,
              |    quantile_cont(avg_value, 0.75) AS q3
              |  FROM site_avg GROUP BY 1)
              |SELECT s.parameter_id, s.site, s.avg_value,
              |  CAST(CASE WHEN s.avg_value < f.q1 - 1.5 * (f.q3 - f.q1)
              |         OR s.avg_value > f.q3 + 1.5 * (f.q3 - f.q1)
              |       THEN 1.0 ELSE 0.0 END AS DOUBLE) AS is_signal
              |FROM site_avg s JOIN fences f USING (parameter_id)""".stripMargin)
    )
  )
}
