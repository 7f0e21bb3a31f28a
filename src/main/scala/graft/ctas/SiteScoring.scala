package graft.ctas

import graft.stats.Stats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Site-bias scoring (R/ctas.R:193-281).
  *
  * Default "ks" method: per (series, feature, ref_group) group, a
  * two-sample KS test of each site's feature values vs the reference
  * complement (global / same-country / same-region), with deterministic
  * hash-based tie-break jitter standing in for the reference's unseeded
  * N(0,1e-5) (R/ctas.R:304 — SURVEY.md §2.3.5), followed by a study-wide
  * Benjamini-Hochberg adjustment and -log10 clipping at 30.
  *
  * "avg_feat_value" method: Tukey-fence on per-site feature averages with
  * exact type-7 quantiles (R/ctas.R:1251-1275).
  */
object SiteScoring {

  private[ctas] case class KsIn(
      timeseries_id: String,
      feature: String,
      ref_group: String,
      subject_id: String,
      site: String,
      country: String,
      region: String,
      value: Double)

  private[ctas] case class KsOut(
      timeseries_id: String,
      feature: String,
      ref_group: String,
      site: String,
      country: String,
      region: String,
      pvalue_kstest: Double,
      kstest_statistic: Double,
      subject_count: Long)

  def score(
      spark: SparkSession,
      featuresLong: DataFrame,
      liveDefs: DataFrame,
      subjects: DataFrame,
      customReferenceGroups: DataFrame,
      cfg: CtasConfig): DataFrame = {
    import spark.implicits._

    val hasRegion = subjects.columns.contains("region")
    val base0 = featuresLong
      .join(broadcast(subjects), Seq("subject_id")) // inner (R/ctas.R:196)
      .join(broadcast(liveDefs.select(col("timeseries_id"), col("parameter_id"),
        col("subject_count_min"))), Seq("timeseries_id"))
    val base =
      (if (!customReferenceGroups.isEmpty)
         base0.join(broadcast(customReferenceGroups), Seq("parameter_id", "feature"), "left")
       else base0.withColumn("ref_group", lit(null).cast("string")))
        .withColumn("ref_group", coalesce(col("ref_group"), lit("global")))
        .withColumn("region",
          if (hasRegion) coalesce(col("region"), lit("")) else lit(""))

    // group eligibility (R/ctas.R:200-204)
    val grpOk = base
      .groupBy(col("timeseries_id"), col("feature"), col("ref_group"))
      .agg(countDistinct(col("site")).as("n_sites"), count(lit(1)).as("n"),
        first(col("subject_count_min")).as("scm"))
      .filter(col("n_sites") >= 2 && col("n") >= col("scm") && col("n_sites") < col("n"))
      .select("timeseries_id", "feature", "ref_group")

    val eligible = base.join(grpOk, Seq("timeseries_id", "feature", "ref_group"), "left_semi")

    if (cfg.siteScoringMethod == "avg_feat_value") {
      return avgFeatValue(eligible)
    }
    if (cfg.siteScoringMethod == "mixedeffects") {
      return MixedEffects.score(spark, eligible, cfg)
    }

    // hot-group cap (VERDICT r03 "What's wrong" #2): the KS kernel holds
    // one (series, feature, ref_group) group's values on one task; at
    // crawl scale (sites = hosts) a group can exceed task memory. Same
    // deterministic hash-sampling contract as the matrix kernels
    // (CtasPipeline.maxKernelSubjectsPerSeries) — a no-op below the cap.
    val grpW = Window.partitionBy(col("timeseries_id"), col("feature"), col("ref_group"))
    val ksCapped = eligible
      .withColumn("__gn", count(lit(1)).over(grpW))
      .filter(graft.rollup.Skew.sampleWithinCap(
        concat_ws("|", col("timeseries_id"), col("feature"), col("ref_group"),
          col("subject_id")),
        col("__gn"), cfg.maxScoringSubjectsPerGroup))

    val ksRows = ksCapped
      .select(col("timeseries_id"), col("feature"), col("ref_group"),
        col("subject_id"), col("site"), col("country"), col("region"),
        col("feature_value").as("value"))
      .as[KsIn]

    val scored = ksRows
      .groupByKey(r => (r.timeseries_id, r.feature, r.ref_group))
      .flatMapGroups { (key: (String, String, String), it: Iterator[KsIn]) =>
        ksKernel(key._1, key._2, key._3, it.toArray)
      }
      .toDF()

    // study-wide FDR (R/ctas.R:222) + -log10 clip at 30 (R/ctas.R:223-225)
    val withAdj = padjust(scored, "pvalue_kstest", "fdr_adjusted_pvalue_ks", cfg.padjustMethod)

    withAdj
      .withColumn("pvalue_kstest_logp", negLog10Clipped(col("pvalue_kstest")))
      .withColumn("fdr_corrected_pvalue_logp", negLog10Clipped(col("fdr_adjusted_pvalue_ks")))
      .select(
        col("timeseries_id"), col("site"), col("country"), col("region"),
        col("feature"), col("pvalue_kstest_logp"), col("kstest_statistic"),
        col("fdr_corrected_pvalue_logp"), col("ref_group"), col("subject_count"))
  }

  /** -log10(p) with Inf clipped to 30 (R/ctas.R:223-225). p = 0 handled
    * explicitly (ANSI log10 would reject it).
    */
  private def negLog10Clipped(p: org.apache.spark.sql.Column) = {
    val lp = -log10(p)
    when(p <= 0, lit(30.0))
      .otherwise(when(lp === Double.PositiveInfinity, lit(30.0)).otherwise(lp))
  }

  /** p.adjust over the whole result set. The global window runs on a
    * single partition — acceptable because site-score cardinality is
    * (series × features × sites), orders of magnitude below the fact
    * table (SURVEY.md §2.2 window notes).
    */
  def padjust(df: DataFrame, pCol: String, outCol: String, method: String): DataFrame =
    method match {
      case "fdr" | "BH" =>
        val wDesc = Window.orderBy(col(pCol).desc)
        val n = count(lit(1)).over(Window.partitionBy())
        val rankAsc = n - row_number().over(wDesc) + 1
        val factor = col(pCol) * n / rankAsc
        df.withColumn(outCol,
          least(lit(1.0),
            min(factor).over(wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      case "bonferroni" =>
        df.withColumn(outCol,
          least(lit(1.0), col(pCol) * count(lit(1)).over(Window.partitionBy())))
      case "holm" =>
        // ascending cummax of (n - i + 1)·p_(i) (stats::p.adjust "holm")
        val wAsc = Window.orderBy(col(pCol).asc)
        val n = count(lit(1)).over(Window.partitionBy())
        val factor = col(pCol) * (n - row_number().over(wAsc) + 1)
        df.withColumn(outCol,
          least(lit(1.0),
            max(factor).over(wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      case "hochberg" =>
        // descending cummin of k·p_(n-k+1), k = rank from the largest p
        val wDesc = Window.orderBy(col(pCol).desc)
        val factor = col(pCol) * row_number().over(wDesc)
        df.withColumn(outCol,
          least(lit(1.0),
            min(factor).over(wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      case "BY" =>
        // Benjamini-Yekutieli: BH factors scaled by the harmonic number
        // H_n = Σ 1/i. Ranks 1..n each occur exactly once, so H_n is the
        // full-window sum of 1/rank — computed in a second select because
        // window expressions can't nest.
        val wDesc = Window.orderBy(col(pCol).desc)
        val n = count(lit(1)).over(Window.partitionBy())
        val ranked = df
          .withColumn("__rank_asc", n - row_number().over(wDesc) + 1)
          .withColumn("__n", n)
          .withColumn("__harmonic",
            sum(lit(1.0) / col("__rank_asc")).over(Window.partitionBy()))
        val factor = col(pCol) * col("__harmonic") * col("__n") / col("__rank_asc")
        ranked
          .withColumn(outCol,
            least(lit(1.0),
              min(factor).over(Window.orderBy(col("__rank_asc").desc)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
          .drop("__rank_asc", "__n", "__harmonic")
      case "none" =>
        df.withColumn(outCol, col(pCol))
      case other =>
        // R's remaining method is "hommel" — not implemented (rarely
        // used; reference default is "fdr", R/ctas.R:34)
        throw new IllegalArgumentException(s"Unsupported padjust method: $other")
    }

  // ------------------------------------------------------------ KS kernel

  private def ksKernel(
      ts: String, feature: String, refGroup: String,
      rowsIn: Array[KsIn]): Iterator[KsOut] = {
    // deterministic order (R relies on frame row order for first())
    val rows = rowsIn.sortBy(_.subject_id)
    val n = rows.length

    // deterministic tie-break jitter, N(0, 1e-5)-distributed
    val values = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = rows(i)
      values(i) = r.value +
        Stats.jitter(Stats.hash64(s"$ts|$feature|$refGroup|${r.subject_id}|${r.site}"))
      i += 1
    }

    // one-sided map (R/ctas.R:309-313)
    val alternative: Stats.KsAlternative = feature match {
      case "own_site_simil_score"         => Stats.Less
      case "unique_value_count_relative"  => Stats.Greater
      case _                              => Stats.TwoSided
    }

    val sites = rows.map(_.site)
    val uniqueSites = sites.distinct

    uniqueSites.iterator.flatMap { site =>
      val inIdx = rows.indices.filter(i => sites(i) == site)
      val refIdx = refGroup match {
        case "country" =>
          val c = rows(inIdx.head).country
          rows.indices.filter(i => rows(i).country == c && sites(i) != site)
        case "region" =>
          val rg = rows(inIdx.head).region
          rows.indices.filter(i => rows(i).region == rg && sites(i) != site)
        case _ =>
          rows.indices.filter(i => sites(i) != site)
      }
      if (refIdx.isEmpty) Iterator.empty // R/ctas.R:350
      else {
        val x = inIdx.map(values).toArray
        val y = refIdx.map(values).toArray
        val ks = Stats.ksTest(x, y, alternative)
        // NA p with D == 1 => 1e-100 patch (R/ctas.R:367-375)
        val p = if (ks.pValue.isNaN && ks.statistic == 1.0) 1e-100 else ks.pValue
        val head = rows(inIdx.head)
        Iterator.single(KsOut(ts, feature, refGroup, site,
          head.country, head.region, p, ks.statistic,
          inIdx.map(i => rows(i).subject_id).distinct.length.toLong))
      }
    }
  }

  // ----------------------------------------------------- avg_feat_value

  /** calculate_simple_site_feature_avgs (R/ctas.R:1251-1275): per-site
    * mean, Tukey fence on site averages with exact type-7 quantiles.
    */
  private def avgFeatValue(eligible: DataFrame): DataFrame = {
    val siteAvg = eligible
      .groupBy(col("timeseries_id"), col("feature"), col("ref_group"), col("site"))
      .agg(avg(col("feature_value")).as("avg_value"))
    val fences = siteAvg
      .groupBy(col("timeseries_id"), col("feature"), col("ref_group"))
      .agg(
        expr("percentile(avg_value, 0.25)").as("q1"),
        expr("percentile(avg_value, 0.75)").as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    siteAvg
      .join(fences, Seq("timeseries_id", "feature", "ref_group"))
      .withColumn("is_signal",
        when(col("avg_value") < col("q1") - lit(1.5) * col("iqr") ||
          col("avg_value") > col("q3") + lit(1.5) * col("iqr"), lit(1.0))
          .otherwise(lit(0.0)))
      .select(col("timeseries_id"), col("feature"), col("site").as("entity"),
        col("is_signal"))
  }
}
