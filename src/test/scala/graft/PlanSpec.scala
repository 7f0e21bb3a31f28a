package graft

import graft.rollup.{CrawlSynth, SeriesDerive}
import org.apache.spark.sql.functions._

/** Plan-quality assertions: predicate pushdown reaches the parquet scan,
  * unused columns (notably the html binary) are pruned, dimension joins
  * broadcast, and the hot paths stay inside whole-stage codegen
  * (SURVEY.md §4.2).
  */
class PlanSpec extends GraftSuite {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("filters push down to the parquet scan") {
    val df = spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("GreaterThan(l_quantity,45.0)") ||
      plan.contains("GreaterThan(l_quantity"), "quantity filter should be pushed")
    assert(plan.contains("IsNotNull(l_returnflag)") ||
      plan.contains("EqualTo(l_returnflag,R)"), "returnflag filter should be pushed")
  }

  test("column pruning: projecting 2 columns reads a 2-column schema") {
    val df = spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"unprojected column read: $readSchema")
  }

  test("rollup derive never reads the html binary unless extracting") {
    val dir = java.nio.file.Files.createTempDirectory("planpages").toString
    CrawlSynth.pages(spark, 200, nHosts = 10, numPartitions = 2)
      .write.mode("overwrite").parquet(dir)
    // hostSeries (text-based) must prune html
    val plan = planOf(SeriesDerive.hostSeries(spark.read.parquet(dir)))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("html"), s"html not pruned: $readSchema")
    // the html-extracting variant reads html but must prune text's oracle
    val planRich = planOf(SeriesDerive.hostSeriesFromHtml(spark.read.parquet(dir)))
    val rs2 = planRich.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs2.contains("html"))
  }

  test("single-pass rollup chain: derive -> selective gap-fill -> hourly " +
      "plans exactly one exchange (hourly agg reuses the window partitioning)") {
    val dir = java.nio.file.Files.createTempDirectory("planpages1p").toString
    CrawlSynth.pages(spark, 200, nHosts = 10, numPartitions = 2)
      .write.mode("overwrite").parquet(dir)
    val series = SeriesDerive.hostSeriesRich(spark.read.parquet(dir))
    val isCont = col("series_id").startsWith("text_length") ||
      col("series_id").startsWith("quality") ||
      col("series_id").startsWith("lang_match")
    val dense = graft.rollup.GapFill.densifyLocf(
      series.withColumn("bucket", col("hour_rank").cast("long")),
      Seq("series_id"), "bucket", "value", "v", isCont)
      .select(col("series_id"), col("bucket").as("hour_rank"), col("v").as("value"))
    val hourly = graft.rollup.Tiers.hourly(dense, "series_id", "hour_rank", "value")
    val plan = hourly.queryExecution.executedPlan.toString
    // full chain from raw pages: the derive's own per-(host,hour)
    // aggregation exchange + the gap-fill window's exchange — the hourly
    // aggregate itself adds NONE (it reuses the window's series_id
    // partitioning), and nothing is persisted
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 2,
      s"expected two exchanges (derive agg + window), found $nExchanges:\n$plan")
    assert(!plan.contains("InMemoryTableScan"), "no persist in the fused chain")

    // isolate gap-fill -> hourly: from an already-derived series table the
    // whole selective-fill + hourly-tier chain is ONE exchange
    import spark.implicits._
    val seriesIn = Seq(("text_length|h1", 1L, 1.0), ("pages|h1", 2L, 2.0))
      .toDF("series_id", "hour_rank", "value")
    val dense2 = graft.rollup.GapFill.densifyLocf(
      seriesIn.withColumn("bucket", col("hour_rank").cast("long")),
      Seq("series_id"), "bucket", "value", "v", isCont)
      .select(col("series_id"), col("bucket").as("hour_rank"), col("v").as("value"))
    val plan2 = graft.rollup.Tiers.hourly(dense2, "series_id", "hour_rank", "value")
      .queryExecution.executedPlan.toString
    val nEx2 = "Exchange hashpartitioning".r.findAllIn(plan2).length
    assert(nEx2 == 1, s"expected one exchange, found $nEx2:\n$plan2")
  }

  test("KS site scoring incl. study-wide FDR plans no single-partition " +
    "exchange (VERDICT r04 #1: padjust used to global-sort on one task)") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(9)
    val rows = (0 until 200).map { i =>
      (s"subj_$i", s"site_${i % 10}", rng.nextGaussian())
    }
    val features = rows.map { case (s, _, v) => ("ts_p", s, "average", v) }
      .toDF("timeseries_id", "subject_id", "feature", "feature_value")
    val subjects = rows.map { case (s, site, _) => (s, site, "c1", "r1") }
      .toDF("subject_id", "site", "country", "region")
    val liveDefs = Seq(("ts_p", "param1", 3.0))
      .toDF("timeseries_id", "parameter_id", "subject_count_min")
    val scored = graft.ctas.SiteScoring.score(spark, features, liveDefs,
      subjects, spark.emptyDataFrame, graft.ctas.CtasConfig())
    scored.collect()
    val exec = scored.queryExecution.executedPlan.toString
    assert(!exec.contains("SinglePartition"),
      "scored plan has a single-partition exchange:\n" + exec.take(2000))
    spark.catalog.clearCache()
  }

  test("dimension joins broadcast") {
    val plan = planOf(SparkEntry.queries("q_join_broadcast")(spark, sfTiny))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "expected broadcast join for dimensions")
  }

  test("scalar feature aggregation is hash-based and codegen'd") {
    val df = SparkEntry.queries("q_ts_features")(spark, sfTiny)
    df.collect() // finalize THIS dataset's AQE plan (count() would re-plan)
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("HashAggregate"), "expected hash aggregation")
    // codegen'd stages carry the "*(n)" whole-stage marker in the
    // executed-plan tree (formatted explain of an unexecuted AQE plan
    // shows isFinalPlan=false with no codegen ids)
    assert(exec.contains("*("), "expected whole-stage codegen markers:\n" + exec.take(800))
  }

  test("LSH dedup / ANN candidate plans never degenerate into cartesian joins") {
    // every candidate generator must be a bucketed equi-join: a plan that
    // falls back to CartesianProduct / BroadcastNestedLoopJoin is O(n^2)
    // over the corpus and dies at 100 TB. (q_ann_bruteforce_topk is the
    // documented bounded-Q exception and is excluded.)
    for (q <- Seq("q_dedup_minhash_lsh", "q_dedup_simhash", "q_ann_lsh_topk",
        "q_ann_ivf_topk", "q_dedup_embedding")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfTiny))
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join")
    }
  }

  test("relational autogen's membership join is a broadcast hash join, " +
    "not a nested loop") {
    // the interval-containment membership join carries equi keys
    // (parameter_id, baseline) with the range as a join filter — Spark
    // must extract them into a BroadcastHashJoin; a BNLJ would scan all
    // series per interval row at crawl scale
    val study = graft.ctas.FixtureGen.generate(spark, seed = 3L)
    val coverage = study.input.data
      .filter(org.apache.spark.sql.functions.col("result").isNotNull)
      .withColumn("has_baseline_value", org.apache.spark.sql.functions.lit("No"))
      .select("parameter_id", "subject_id", "timepoint_rank", "has_baseline_value")
      .distinct()
    val params = study.input.parameters
      .withColumn("time_point_count_min", org.apache.spark.sql.functions.lit(3.0))
      .withColumn("subject_count_min", org.apache.spark.sql.functions.lit(3.0))
      .withColumn("max_share_missing", org.apache.spark.sql.functions.lit(0.5))
      .withColumn("generate_change_from_baseline", org.apache.spark.sql.functions.lit(false))
      .withColumn("use_only_custom_timeseries", org.apache.spark.sql.functions.lit(false))
    // autogenerate() checkpoints membership (its executed plan is then a
    // scan), so assert on the join as built: intervals ⋈ a literal defs
    // relation — the exact shape autogenerate uses pre-checkpoint
    import spark.implicits._
    val (_, intervals) = graft.ctas.SeriesGen.autogenSummary(
      coverage, params, study.input.subjects, "consecutive")
    val defsSmall = org.apache.spark.sql.functions.broadcast(
      Seq(("param1", "original", 3L, "ts_1_autogen_original"))
        .toDF("parameter_id", "baseline", "prefix_len", "timeseries_id"))
    val mem = intervals
      .join(defsSmall, Seq("parameter_id", "baseline"))
      .filter(org.apache.spark.sql.functions.col("lmin") <=
        org.apache.spark.sql.functions.col("prefix_len") &&
        org.apache.spark.sql.functions.col("prefix_len") <=
          org.apache.spark.sql.functions.col("lmax"))
      .select("timeseries_id", "subject_id")
    mem.collect()
    val exec = mem.queryExecution.executedPlan.toString
    assert(!exec.contains("BroadcastNestedLoopJoin"),
      "membership join degenerated to a nested loop:\n" + exec.take(1200))
    assert(!exec.contains("CartesianProduct"))
    assert(exec.contains("BroadcastHashJoin"),
      "expected a broadcast hash join on (parameter_id, baseline):\n" + exec.take(1200))
  }

  test("jaccardVerify's candidate semi-join reuses the candidate exchange") {
    // nearDuplicates references the LSH candidate subplan three times
    // (pairs + the two ids of the semi-join filter). ReuseExchange must
    // dedupe those into ReusedExchange nodes — otherwise candidate
    // generation (a shuffle) runs 3x per job at corpus scale.
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val nd = graft.dedup.Dedup.nearDuplicates(docs, "doc_id", "text", 0.5)
    nd.collect() // finalize the AQE physical plan
    val exec = nd.queryExecution.executedPlan.toString
    assert(exec.contains("ReusedExchange") || exec.contains("TableCacheQueryStage")
      || exec.contains("ReusedSubquery"),
      "candidate subplan not reused:\n" + exec.take(1200))
  }

  test("native SimHash64 expression runs inside a codegen'd projection") {
    // non-foldable input (range-derived) so the projection isn't
    // collapsed into a LocalTableScan at optimization time
    val df = spark.range(2)
      .select(concat(lit("alpha beta gamma delta id"), col("id")).as("text"))
      .select(graft.functions.SimHash64(
        split(trim(col("text")), "\\s+"), 2).as("sh"))
    df.collect()
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.toLowerCase.contains("simhash64"), exec.take(400))
    assert(exec.contains("*("), "expected whole-stage codegen marker:\n" + exec.take(800))
    assert(df.collect().map(_.getLong(0)).distinct.length === 2)
  }
}
