package graft

import graft.ctas._
import org.apache.spark.sql.functions._

class MixedEffectsSpec extends GraftSuite {

  lazy val study = FixtureGen.generate(spark, seed = 21L, biasedSite = Some("ABA"))

  test("mixedeffects scoring: rows per entity at every level, valid p-values") {
    val out = CtasPipeline.processAStudy(study.input,
      CtasConfig(defaultFeatures = "average;sd",
        siteScoringMethod = "mixedeffects")).get
    val scores = out.siteScores.cache()
    assert(scores.count() > 0)
    assert(scores.columns.toSeq === Seq("timeseries_id", "feature", "entity",
      "mean", "median", "sd", "p_value", "fdr_corrected_pvalue_logp"))
    val bad = scores.filter(col("p_value") < 0 || col("p_value") > 1 ||
      col("sd") < 0 || col("p_value").isNull)
    assert(bad.isEmpty)
    // entities include sites, countries and regions (nested levels)
    val entities = scores.select("entity").distinct().collect().map(_.getString(0)).toSet
    val sites = study.subjects.select("site").distinct().collect().map(_.getString(0)).toSet
    val regions = study.subjects.select("region").distinct().collect().map(_.getString(0)).toSet
    assert(entities.intersect(sites).nonEmpty, "site-level entities expected")
    assert(entities.intersect(regions).nonEmpty, "region-level entities expected")
  }

  test("mixedeffects: biased site has a larger |median| effect than typical sites") {
    val out = CtasPipeline.processAStudy(study.input,
      CtasConfig(defaultFeatures = "average",
        siteScoringMethod = "mixedeffects")).get
    val rows = out.siteScores
      .filter(col("feature") === "average")
      .select("entity", "median").collect()
      .map(r => r.getString(0) -> math.abs(r.getDouble(1)))
    val byEntity = rows.groupBy(_._1).map { case (e, v) => e -> v.map(_._2).max }
    if (byEntity.contains("ABA")) {
      val others = byEntity.filter(_._1 != "ABA").values
      val typical = others.toSeq.sorted.apply(others.size / 2)
      assert(byEntity("ABA") > typical,
        s"biased site effect ${byEntity("ABA")} should exceed median-typical $typical")
    }
  }

  test("deterministic: two runs give identical scores") {
    val cfg = CtasConfig(defaultFeatures = "average", siteScoringMethod = "mixedeffects")
    val a = CtasPipeline.processAStudy(study.input, cfg).get.siteScores
      .orderBy("timeseries_id", "feature", "entity").collect()
    val b = CtasPipeline.processAStudy(study.input, cfg).get.siteScores
      .orderBy("timeseries_id", "feature", "entity").collect()
    assert(a.toSeq === b.toSeq)
  }
}
