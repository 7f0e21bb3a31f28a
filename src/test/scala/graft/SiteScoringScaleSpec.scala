package graft

import graft.ctas._
import org.apache.spark.sql.functions._

/** Scale-shape specs for the site-scoring kernels (VERDICT r03 "Next
  * round" #2): the KS kernel input is capped with deterministic hash
  * sampling, and the mixed-effects kernel receives a per-(site,country,
  * region) sufficient-statistics reduction so row count never bounds the
  * solve. Both are exercised with a 10⁵-row / ~10³-site group.
  */
class SiteScoringScaleSpec extends GraftSuite {
  import spark.implicits._

  private val nSubjects = 100000
  private val nSites = 1000

  /** 10⁵ subjects over 10³ sites, one (series, feature) group; site0 is
    * shifted so a real signal survives the sampling.
    */
  private lazy val bigGroup = {
    val rng = new java.util.SplittableRandom(42)
    val rows = (0 until nSubjects).map { i =>
      val site = i % nSites
      val shift = if (site == 0) 3.0 else 0.0
      (s"subj_$i", s"site_$site", rng.nextGaussian() + shift)
    }
    val features = rows.map { case (subj, _, v) => ("ts_big", subj, "average", v) }
      .toDF("timeseries_id", "subject_id", "feature", "feature_value")
    val subjects = rows.map { case (subj, site, _) => (subj, site, "c1", "r1") }
      .toDF("subject_id", "site", "country", "region")
    val liveDefs = Seq(("ts_big", "param1", 3.0))
      .toDF("timeseries_id", "parameter_id", "subject_count_min")
    (features, subjects, liveDefs)
  }

  test("KS scoring: 1e5-row/1e3-site group completes under the cap with " +
    "sampled subject counts near the cap") {
    val (features, subjects, liveDefs) = bigGroup
    val out = SiteScoring.score(spark, features, liveDefs, subjects,
      spark.emptyDataFrame,
      CtasConfig(maxScoringSubjectsPerGroup = 5000)).cache()
    val n = out.count()
    assert(n > 900, s"most sites should still be scored, got $n rows")
    // hash sampling keeps each subject w.p. cap/groupSize => the kept
    // total concentrates at the cap (binomial sd ≈ √5000 ≈ 71)
    val kept = out.agg(sum(col("subject_count"))).collect()(0).getLong(0)
    assert(kept > 4000 && kept < 6500,
      s"sampled group size should be ≈ cap 5000, got $kept")
    // the planted signal survives sampling: site_0's two-sided KS logp
    // is among the study's strongest
    val site0 = out.filter(col("site") === "site_0")
      .select(col("pvalue_kstest_logp")).collect()(0).getDouble(0)
    assert(site0 > 3.0, s"planted shift should stay detectable, logp=$site0")
    out.unpersist()
    spark.catalog.clearCache() // suite shares one JVM — drop the 1e5-row blocks
  }

  test("KS scoring: cap is a no-op below the threshold (outputs unchanged)") {
    val study = FixtureGen.generate(spark, seed = 5L)
    val base = CtasPipeline.processAStudy(study.input,
      CtasConfig(defaultFeatures = "average;sd")).get.siteScores
      .orderBy("timeseries_id", "feature", "site", "ref_group").collect()
    val uncapped = CtasPipeline.processAStudy(study.input,
      CtasConfig(defaultFeatures = "average;sd",
        maxScoringSubjectsPerGroup = Int.MaxValue)).get.siteScores
      .orderBy("timeseries_id", "feature", "site", "ref_group").collect()
    assert(base.toSeq === uncapped.toSeq)
  }

  test("mixed-effects: 1e5-row/300-site group solves from sufficient " +
    "statistics and matches direct one-way REML") {
    val g = 300
    val rng = new java.util.SplittableRandom(7)
    val sizes = Array.tabulate(g)(i => 210 + (i * 37) % 267) // unbalanced
    val trueEff = Array.tabulate(g)(i => ((i % 11) - 5.0) * 1.5)
    val rows = for {
      i <- 0 until g
      j <- 0 until sizes(i)
    } yield ("ts_scale", "average", "country", s"subj_${i}_$j",
      f"site$i%03d", "c1", "r1", 50.0 + trueEff(i) + rng.nextGaussian() * 2.0)
    val n = rows.length
    assert(n >= 100000, s"intended a 1e5-row group, got $n")
    val eligible = rows.toDF("timeseries_id", "feature", "ref_group",
      "subject_id", "site", "country", "region", "feature_value")

    // independent direct REML (profiled one-way criterion, golden section)
    val ys = rows.map(_._8).toArray
    val bounds = sizes.scanLeft(0)(_ + _)
    val gSums = (0 until g).map(i => ys.slice(bounds(i), bounds(i + 1)).sum)
    val gMeans = (0 until g).map(i => gSums(i) / sizes(i))
    val yy = ys.map(v => v * v).sum
    def criterion(gamma: Double): Double = {
      val xhx = sizes.map(ng => ng / (1 + gamma * ng)).sum
      val xhy = (0 until g).map(i => gSums(i) / (1 + gamma * sizes(i))).sum
      val yhy = yy - (0 until g).map(i =>
        gamma * gSums(i) * gSums(i) / (1 + gamma * sizes(i))).sum
      val ypy = yhy - xhy * xhy / xhx
      sizes.map(ng => math.log(1 + gamma * ng)).sum +
        math.log(xhx) + (n - 1) * math.log(ypy)
    }
    var (lo, hi) = (math.log(1e-8), math.log(1e4))
    val phi = (math.sqrt(5.0) - 1) / 2
    (0 until 200).foreach { _ =>
      val a = hi - phi * (hi - lo); val b = lo + phi * (hi - lo)
      if (criterion(math.exp(a)) < criterion(math.exp(b))) hi = b else lo = a
    }
    val gammaHat = math.exp((lo + hi) / 2)
    val xhx = sizes.map(ng => ng / (1 + gammaHat * ng)).sum
    val xhy = (0 until g).map(i => gSums(i) / (1 + gammaHat * sizes(i))).sum
    val beta = xhy / xhx
    val yhy = yy - (0 until g).map(i =>
      gammaHat * gSums(i) * gSums(i) / (1 + gammaHat * sizes(i))).sum
    val se2 = (yhy - xhy * xhy / xhx) / (n - 1)
    val sa2 = gammaHat * se2

    val t0 = System.nanoTime()
    val out = MixedEffects.score(spark, eligible, CtasConfig()).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length === g)
    // completes in bounded time: the kernel saw 300 sufficient-stat rows,
    // not 1e5 subject rows, and EM work is budgeted by maxIterFor(m)
    assert(secs < 120.0, f"mixed-effects on 1e5 rows took $secs%.0f s")
    Seq(0, 37, 123, 299).foreach { i =>
      val row = out.find(_.getAs[String]("entity") == f"site$i%03d").get
      val ng = sizes(i)
      val blup = (ng * gammaHat / (1 + ng * gammaHat)) * (gMeans(i) - beta)
      val postSd = math.sqrt(se2 / (ng + se2 / sa2))
      val mcTol = 5.0 * postSd / math.sqrt(500.0) + 0.02 * math.abs(blup) + 1e-3
      assert(math.abs(row.getAs[Double]("mean") - blup) <= mcTol,
        f"site$i BLUP at scale: got ${row.getAs[Double]("mean")}%.4f want $blup%.4f ±$mcTol%.4f")
    }
  }

  // VERDICT r04 "What's wrong" #1 / "Next round" #1: p.adjust used to
  // run every method on a single-partition global window. The reworked
  // two-pass shape (range partition + rank offsets + per-partition
  // running extremum + K-row carry) must (a) plan NO single-partition
  // exchange and (b) return exactly R's adjusted values — checked here
  // against an independent local cummin/cummax reference on 10⁶ rows
  // with heavy ties.
  test("p.adjust: 1e6 rows distribute with no single-partition exchange " +
    "and match a local reference for every method") {
    val nBig = 1000000
    val rng = new java.util.SplittableRandom(11)
    // 4 decimal places => ~100 rows per tie group on average
    val ps = Array.fill(nBig)(math.round(rng.nextDouble() * 10000) / 10000.0)

    def localAdjust(method: String): Array[Double] = {
      val n = ps.length
      val byP = ps.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](n)
      method match {
        case "bonferroni" =>
          var i = 0
          while (i < n) { out(i) = math.min(1.0, ps(i) * n); i += 1 }
        case "holm" =>
          var run = Double.NegativeInfinity
          var r = 0
          while (r < n) {
            val (p, i) = byP(r)
            run = math.max(run, p * (n - r)) // rank = r+1, factor p·(n-rank+1)
            out(i) = math.min(1.0, run)
            r += 1
          }
        case _ =>
          val hn = if (method == "BY") graft.ctas.SiteScoring.harmonicNumber(n) else 0.0
          var run = Double.PositiveInfinity
          var r = n - 1
          while (r >= 0) {
            val (p, i) = byP(r)
            val factor = method match {
              case "fdr"      => p * n / (r + 1)
              case "hochberg" => p * (n - r)
              case "BY"       => p * hn * n / (r + 1)
            }
            run = math.min(run, factor)
            out(i) = math.min(1.0, run)
            r -= 1
          }
      }
      out
    }

    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ps.zipWithIndex.map { case (p, i) =>
          org.apache.spark.sql.Row(i.toLong, p)
        }.toSeq, 32),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.DoubleType))))

    for (method <- Seq("fdr", "holm", "hochberg", "BY", "bonferroni")) {
      val out = SiteScoring.padjust(df, "p", "p_adj", method)
      val rows = out.collect()
      val exec = out.queryExecution.executedPlan.toString
      assert(!exec.contains("SinglePartition"),
        s"$method plans a single-partition exchange:\n${exec.take(1500)}")
      val expected = localAdjust(method)
      assert(rows.length === nBig)
      rows.foreach { r =>
        val i = r.getAs[Long]("id").toInt
        val got = r.getAs[Double]("p_adj")
        assert(math.abs(got - expected(i)) < 1e-12,
          s"$method id=$i p=${ps(i)}: got $got want ${expected(i)}")
      }
      spark.catalog.clearCache() // padjust persists its input; 5 methods × 1e6 rows
    }
  }

  test("maxIterFor budgets EM work by MME dimension") {
    assert(MixedEffects.maxIterFor(50) === 500)
    assert(MixedEffects.maxIterFor(200) === 500)
    assert(MixedEffects.maxIterFor(500) === 32)
    assert(MixedEffects.maxIterFor(1000) === 10)
    assert(MixedEffects.maxIterFor(5000) === 10)
  }
}
