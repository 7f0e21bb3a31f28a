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

  // VERDICT r04 "Next round" #4: as-of join and sessionization partition
  // by key only, so one hot key's full history flows through ONE task's
  // sort + running window. Both stages are spill-backed (UnsafeExternal-
  // Sorter for the sort, O(1) carry state for the running frames), so a
  // 10^7-row key must DEGRADE to disk, not cliff — this drives exactly
  // that and checks values at the far end of the partition.
  test("hot key: a 1e7-row single-key history completes through as-of " +
    "join and sessionize with correct carries (spill path, no OOM)") {
    val n = 10000000L
    // left: one key, points at even ticks; right: 1000 anchors every 2e4
    val left = spark.range(n)
      .select(lit("hot").as("key"), (col("id") * 2.0).as("lt"))
    val right = spark.range(1000)
      .select(lit("hot").as("key"), (col("id") * 20000.0).as("rt"),
        col("id").cast("double").as("v"))
    val joined = graft.rollup.AsOfJoin.asof(
      left, right, Seq("key"), "lt", "rt", Seq("v"))
    assert(joined.count() === n)
    // spot-check carries deep into the partition: lt=2*k matches anchor
    // floor(2k/20000)
    val probes = joined
      .filter(col("lt").isin(0.0, 3999998.0, 19999998.0))
      .select(col("lt"), col("v")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(probes(0.0) === 0.0)
    assert(probes(3999998.0) === 199.0)
    assert(probes(19999998.0) === 999.0)

    // sessionize the same single-key history: stride 2 < gap 3 => ONE
    // session spanning the whole key
    val sess = graft.rollup.Sessionize.stats(
      left.withColumnRenamed("lt", "t"), Seq("key"), "t", gap = 3.0)
      .collect()
    assert(sess.length === 1)
    assert(sess(0).getAs[Long]("n_events") === n)
    assert(sess(0).getAs[Double]("session_end") === (n - 1) * 2.0)
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
