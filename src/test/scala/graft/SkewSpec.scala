package graft

import graft.rollup.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends GraftSuite {
  import spark.implicits._

  test("salted tier state equals direct aggregation") {
    val df = (1 to 5000).map { i =>
      // hot key: 80% of rows on one key
      val key = if (i % 5 != 0) "hot" else s"k${i % 37}"
      (key, i.toDouble % 97)
    }.toDF("k", "v")
    val salted = Skew.saltedTierState(df, Seq("k"), "v",
      saltBy = col("v"), saltBuckets = 8)
    val direct = df.groupBy("k").agg(
      count(col("v")).as("n"), sum(col("v")).as("sum"),
      sum(col("v") * col("v")).as("sumsq"),
      min(col("v")).as("min"), max(col("v")).as("max"))
    val diff = salted.alias("a").join(direct.alias("b"), Seq("k"), "full")
      .filter(col("a.n") =!= col("b.n") || col("a.min") =!= col("b.min") ||
        col("a.max") =!= col("b.max") ||
        abs(col("a.sum") - col("b.sum")) > 1e-9 ||
        col("a.n").isNull || col("b.n").isNull)
    assert(diff.isEmpty)
  }

  test("sampleWithinCap keeps everything under the cap, downsamples above") {
    val df = (1 to 1000).map(i => ("g", s"s$i")).toDF("g", "s")
      .withColumn("n", lit(1000L))
    val under = df.filter(Skew.sampleWithinCap(col("s"), col("n"), 2000)).count()
    assert(under === 1000)
    val over = df.filter(Skew.sampleWithinCap(col("s"), col("n"), 100)).count()
    assert(over > 30 && over < 300, s"expected ~100, got $over")
    // deterministic
    val again = df.filter(Skew.sampleWithinCap(col("s"), col("n"), 100)).count()
    assert(over === again)
  }

  test("kernel cap bounds matrix-kernel input without breaking the pipeline") {
    val study = graft.ctas.FixtureGen.generate(spark, seed = 31L)
    val cfg = graft.ctas.CtasConfig(
      defaultFeatures = "lof;average",
      maxKernelSubjectsPerSeries = 20) // force sampling
    val out = graft.ctas.CtasPipeline.processAStudy(study.input, cfg)
    assert(out.isDefined)
    // lof rows exist but per-series subject counts are bounded-ish
    val lofCounts = out.get.timeseriesFeatures
      .filter(col("feature") === "lof")
      .groupBy("timeseries_id").count().collect()
    lofCounts.foreach(r => assert(r.getLong(1) <= 60,
      s"sampled kernel input should stay near the cap: $r"))
  }
}
