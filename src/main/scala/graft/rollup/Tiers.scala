package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Continuous-aggregate tiers (north_rule): hourly -> daily -> weekly.
  *
  * Each tier row carries an ALGEBRAIC partial state
  * (n, sum, sumsq, min, max) so a coarser tier is a plain re-aggregation
  * of the finer tier — one hash aggregate, map-side partials, no custom
  * merge code (SURVEY.md §2.2 "grouping sets" row: rollup-by-reaggregation,
  * not SQL ROLLUP, because derived stats are computed from merged states).
  * avg/sd are derived columns; non-algebraic kernels (KS/LOF/PCA) recompute
  * from the finest retained tier instead (SURVEY.md §7.4.5).
  */
object Tiers {

  /** bucket width in hours per tier */
  val tierHours: Map[String, Int] = Map("hourly" -> 1, "daily" -> 24, "weekly" -> 168)

  /** Raw points (series_id, hour_rank, value) -> hourly tier with state. */
  def hourly(points: DataFrame, seriesCol: String = "series_id",
      rankCol: String = "hour_rank", valueCol: String = "value"): DataFrame =
    points.groupBy(col(seriesCol), col(rankCol).cast("long").as("bucket"))
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol)).as("sum"),
        sum(col(valueCol) * col(valueCol)).as("sumsq"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))
      .withColumnRenamed(seriesCol, "series_id")

  /** Re-aggregate a finer tier into a coarser one (hour buckets ->
    * day/week buckets). Pure state merge: sums add, min/max combine.
    */
  def rollup(finer: DataFrame, fromTier: String, toTier: String): DataFrame = {
    val ratio = tierHours(toTier) / tierHours(fromTier)
    require(ratio > 1, s"cannot roll $fromTier into $toTier")
    finer.groupBy(col("series_id"), floor(col("bucket") / ratio).as("bucket"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum")).as("sum"),
        sum(col("sumsq")).as("sumsq"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))
  }

  /** Distinct-cardinality tier: per (series, bucket) HLL sketch of an
    * item column (e.g. distinct users per host-hour). The sketch is the
    * continuous-aggregate partial state for COUNT DISTINCT — the one
    * north-rule statistic that has NO exact algebraic state (exact
    * distinct would carry the full item set per bucket). The HLL merge
    * (coupon-set union in sparse mode, per-register max in dense mode)
    * is commutative and idempotent, so the ERROR BOUND is preserved
    * under ANY merge topology — rolling up hourly sketches gives the
    * same guarantee as sketching the coarser bucket directly. The
    * estimates are NOT bit-identical across topologies: the datasketches
    * sparse-to-dense promotion point depends on the accumulation path,
    * so a union-of-many-sketches can promote (and take on the ~1.6%
    * dense-mode error at lgK=12) at a cardinality where direct
    * accumulation is still exact. SketchSpec pins both paths to the
    * bound against exact truth. At 100 TB each host-hour state is a
    * fixed <=2^lgK bytes regardless of traffic.
    */
  def distinctHourly(points: DataFrame, seriesCol: String = "series_id",
      rankCol: String = "hour_rank", itemCol: String = "item",
      lgK: Int = 12): DataFrame =
    points.groupBy(col(seriesCol).as("series_id"),
        col(rankCol).cast("long").as("bucket"))
      .agg(hll_sketch_agg(col(itemCol), lit(lgK)).as("hll"))

  /** Re-aggregate a distinct tier into a coarser one: pure sketch union
    * (same map-side-partial hash aggregate shape as [[rollup]]); the
    * merged sketch keeps the finer tier's error bound (see class doc).
    */
  def rollupDistinct(finer: DataFrame, fromTier: String, toTier: String): DataFrame = {
    val ratio = tierHours(toTier) / tierHours(fromTier)
    require(ratio > 1, s"cannot roll $fromTier into $toTier")
    finer.groupBy(col("series_id"), floor(col("bucket") / ratio).as("bucket"))
      .agg(hll_union_agg(col("hll")).as("hll"))
  }

  /** Cardinality estimate column from the sketch state. */
  def withDistinctEstimate(tier: DataFrame): DataFrame =
    tier.withColumn("distinct_est", hll_sketch_estimate(col("hll")))

  /** Derived per-bucket stats from the algebraic state. */
  def withDerived(tier: DataFrame): DataFrame =
    tier
      .withColumn("avg", try_divide(col("sum"), col("n")))
      .withColumn("sd",
        when(col("n") > 1,
          sqrt(greatest(lit(0.0),
            (col("sumsq") - col("sum") * col("sum") / col("n")) / (col("n") - 1))))
          .otherwise(lit(null)))
      .withColumn("range", col("max") - col("min"))

  /** Per-series anomaly flags over a tier's bucket series (the ctas
    * kernels re-expressed as windowed aggregates over bucket averages):
    * lag-1 autocorrelation, sd of first differences, relative unique
    * count, range z-score spikes. Thresholds are fixed and deterministic
    * so flags are comparable across tiers.
    *
    * `flagGrid` > 0 quantizes the continuous statistics feeding a
    * threshold compare (autocorr, the spike z-ratio) to the dyadic grid
    * k/flagGrid — floor(x*g + 0.5)/g, exact in binary FP — before the
    * compare. fp-summation-order drift in the aggregates (~1e-12) is
    * then 9+ orders of magnitude below the cell size, so the flag set is
    * reproducible across engines/partitionings instead of cliff-edged on
    * the last ulp (ADVICE r02). 0 = compare raw values.
    */
  def anomalyFlags(tier: DataFrame, flagGrid: Long = 0L): DataFrame = {
    def q(c: Column): Column =
      if (flagGrid > 0) floor(c * flagGrid + lit(0.5)) / flagGrid else c
    val t = withDerived(tier)
    val w = Window.partitionBy("series_id").orderBy("bucket")
    // lag-1 in TIME: a pair only counts when the previous observed bucket
    // is exactly one step back, so sparse series don't pair across gaps
    val lagged = t
      .withColumn("prev_avg_raw", lag(col("avg"), 1).over(w))
      .withColumn("prev_bucket", lag(col("bucket"), 1).over(w))
      .withColumn("prev_avg",
        when(col("bucket") - col("prev_bucket") === 1, col("prev_avg_raw")))
    val perSeries = lagged
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_buckets"),
        // lag-1 autocorr from algebraic parts (pairwise complete)
        covar_samp(col("avg"), col("prev_avg")).as("ac_cov"),
        stddev_samp(when(col("prev_avg").isNotNull, col("avg"))).as("ac_sx"),
        stddev_samp(when(col("avg").isNotNull, col("prev_avg"))).as("ac_sy"),
        stddev_samp(col("avg") - col("prev_avg")).as("sd_of_diffs"),
        try_divide(countDistinct(col("avg")) * lit(1.0), count(col("avg")))
          .as("uniq_share"),
        avg(col("avg")).as("series_mean"),
        stddev_samp(col("avg")).as("series_sd"),
        max(col("avg")).as("series_max"),
        min(col("avg")).as("series_min"))
      .withColumn("autocorr", try_divide(col("ac_cov"), col("ac_sx") * col("ac_sy")))
      .withColumn("flag_repeated_values",
        col("n_buckets") >= 5 && col("uniq_share") <= 0.2)
      .withColumn("flag_zigzag",
        col("autocorr").isNotNull && q(col("autocorr")) < -0.8 && col("n_buckets") >= 5)
      .withColumn("flag_spike",
        col("series_sd").isNotNull && col("series_sd") > 0 &&
          q((col("series_max") - col("series_mean")) / col("series_sd")) > 4.0)
      .withColumn("flag_flat",
        col("series_sd").isNotNull && col("series_sd") === 0.0 && col("n_buckets") >= 5)
    perSeries.select(
      col("series_id"), col("n_buckets"), col("autocorr"), col("sd_of_diffs"),
      col("uniq_share"), col("series_mean"), col("series_sd"),
      col("flag_repeated_values"), col("flag_zigzag"), col("flag_spike"), col("flag_flat"))
  }

  /** Gorilla-compress a tier: one chunk per (series, chunk window). */
  def compressChunks(tier: DataFrame, bucketsPerChunk: Int = 1024): DataFrame = {
    import tier.sparkSession.implicits._
    val agg = new Gorilla.ChunkAggregator().toColumn
    val t = withDerived(tier)
    t.select(col("series_id"), col("bucket"), col("avg"))
      .as[(String, Long, Double)]
      .groupByKey(r => (r._1, r._2 / bucketsPerChunk))
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("chunk"))
      .map { case ((series, chunkIdx), chunk) => (series, chunkIdx, chunk) }
      .toDF("series_id", "chunk_idx", "chunk")
  }

  /** Decode compressed chunks back to (series_id, bucket, avg) rows. */
  def decompressChunks(chunks: DataFrame): DataFrame = {
    import chunks.sparkSession.implicits._
    chunks.select(col("series_id"), col("chunk"))
      .as[(String, Array[Byte])]
      .flatMap { case (series, bytes) =>
        Gorilla.decode(bytes).iterator.map(p => (series, p._1, p._2))
      }
      .toDF("series_id", "bucket", "avg")
  }
}
