package graft

import graft.ctas._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** The relational series autogen (VERDICT r03 "Next round" #1):
  *  - full defs + membership equivalence with the reference kernel
  *    (pickTimepointCombos via autogenerateKernelPath) on randomized
  *    coverage bitmaps across modes × optimize × max_share_missing,
  *  - the O(#ranks)-rows-per-parameter bound on the fold input — the
  *    property that makes the relational path scale where the
  *    one-task-per-parameter kernel could not.
  */
class SeriesGenScaleSpec extends GraftSuite {

  private def mkCoverage(rows: Seq[(String, String, Double, String)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("parameter_id", StringType),
      StructField("subject_id", StringType),
      StructField("timepoint_rank", DoubleType),
      StructField("has_baseline_value", StringType)))
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, schema)
  }

  private def mkParams(mm: Double): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("parameter_id", StringType),
      StructField("time_point_count_min", DoubleType),
      StructField("subject_count_min", DoubleType),
      StructField("max_share_missing", DoubleType),
      StructField("generate_change_from_baseline", BooleanType),
      StructField("use_only_custom_timeseries", BooleanType)))
    spark.createDataFrame(Seq(
      Row("p1", 3.0, 3.0, mm, false, false),
      Row("p2", 2.0, 4.0, mm, true, false)).asJava, schema)
  }

  private def mkSubjects(n: Int, nSites: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (f"s$i%04d", s"site${i % nSites}"))
      .toDF("subject_id", "site")
  }

  /** randomized coverage: rank-dependent presence probability (so prefix
    * eligibility actually varies with L), random has_baseline, and some
    * (subject, rank) cells carrying BOTH baseline variants
    */
  private def randomCoverage(seed: Long, nSubj: Int, nRanks: Int)
      : Seq[(String, String, Double, String)] = {
    val rng = new java.util.SplittableRandom(seed)
    for {
      p <- Seq("p1", "p2")
      s <- 0 until nSubj
      r <- 1 to nRanks
      keepP = 0.95 - 0.06 * r // later ranks sparser
      if rng.nextDouble() < keepP
      variants = rng.nextInt(10) match {
        case 0 => Seq("Yes", "No") // both variants present
        case k if k < 6 => Seq("Yes")
        case _ => Seq("No")
      }
      v <- variants
    } yield (p, f"s$s%04d", r.toDouble, v)
  }

  private def collectDefs(defs: DataFrame): Seq[(String, String, String, Seq[Double])] =
    defs.collect().map(r => (
      r.getAs[String]("timeseries_id"),
      r.getAs[String]("parameter_id"),
      r.getAs[String]("baseline"),
      r.getAs[scala.collection.Seq[Double]]("timepoint_combo").toSeq)).toSeq.sortBy(_._1)

  private def collectMem(mem: DataFrame): Set[(String, String)] =
    mem.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("relational autogen ≡ reference kernel on randomized bitmaps " +
    "(modes × optimize × max_share_missing)") {
    val subjects = mkSubjects(30, 5)
    var cfgIdx = 0
    for {
      mode <- Seq("consecutive", "adaptive")
      optimize <- Seq(false, true)
      mm <- Seq(0.0, 0.45, 1.0)
    } {
      cfgIdx += 1
      val cov = mkCoverage(randomCoverage(seed = 100 + cfgIdx, nSubj = 30, nRanks = 8))
      val params = mkParams(mm)
      val cfg = CtasConfig(autogenerate = mode, optimizeSitesAndPatients = optimize)
      val (dk, mk) = SeriesGen.autogenerateKernelPath(spark, cov, params, subjects, cfg)
      val (dr, mr) = SeriesGen.autogenerateRelational(spark, cov, params, subjects, cfg)
      val ctx = s"mode=$mode optimize=$optimize mm=$mm"
      assert(collectDefs(dr) === collectDefs(dk), s"defs diverged: $ctx")
      assert(collectMem(mr) === collectMem(mk), s"membership diverged: $ctx")
    }
  }

  test("boundary max_share_missing values hit exact ceil thresholds") {
    // L=8, mm=0.25: threshold ceil(6.0)=6 — a subject with exactly 6 of
    // 8 ranks must be eligible at L=8; with 5 it must not. Both paths.
    val subjects = mkSubjects(12, 3)
    val rows =
      // 8 subjects with full coverage anchor the series
      (for (s <- 0 until 8; r <- 1 to 8) yield ("p1", f"s$s%04d", r.toDouble, "Yes")) ++
        // s0008: exactly 6 of 8 -> eligible at L=8
        (for (r <- 1 to 6) yield ("p1", "s0008", r.toDouble, "Yes")) ++
        // s0009: 5 of 8 -> not eligible at L=8
        (for (r <- 1 to 5) yield ("p1", "s0009", r.toDouble, "Yes"))
    val params = {
      import scala.jdk.CollectionConverters._
      val schema = StructType(Seq(
        StructField("parameter_id", StringType),
        StructField("time_point_count_min", DoubleType),
        StructField("subject_count_min", DoubleType),
        StructField("max_share_missing", DoubleType),
        StructField("generate_change_from_baseline", BooleanType),
        StructField("use_only_custom_timeseries", BooleanType)))
      spark.createDataFrame(Seq(Row("p1", 3.0, 3.0, 0.25, false, false)).asJava, schema)
    }
    val cfg = CtasConfig(autogenerate = "consecutive")
    val (dr, mr) = SeriesGen.autogenerateRelational(spark, mkCoverage(rows), params, subjects, cfg)
    val (dk, mk) = SeriesGen.autogenerateKernelPath(spark, mkCoverage(rows), params, subjects, cfg)
    assert(collectDefs(dr) === collectDefs(dk))
    assert(collectMem(mr) === collectMem(mk))
    // the longest series (all 8 ranks) includes s0008 but not s0009
    val first = collectDefs(dr).find(_._4.length == 8)
    assert(first.isDefined, "an 8-rank series should be accepted")
    val mem8 = collectMem(mr).filter(_._1 == first.get._1).map(_._2)
    assert(mem8.contains("s0008"), s"exactly-at-threshold subject must be in: $mem8")
    assert(!mem8.contains("s0009"))
  }

  test("fold input is O(#ranks) rows per parameter even with 5000 subjects") {
    // 5000 subjects x 20 ranks: the old kernel path put all ~90k bitmap
    // rows of a parameter into ONE task; the relational path's fold sees
    // at most #ranks rows per (param, baseline)
    val nSubj = 5000; val nRanks = 20
    val rng = new java.util.SplittableRandom(9)
    val rows = for {
      s <- 0 until nSubj
      r <- 1 to nRanks
      if rng.nextDouble() < 0.9
    } yield ("p1", f"s$s%04d", r.toDouble, "Yes")
    val params = {
      import scala.jdk.CollectionConverters._
      val schema = StructType(Seq(
        StructField("parameter_id", StringType),
        StructField("time_point_count_min", DoubleType),
        StructField("subject_count_min", DoubleType),
        StructField("max_share_missing", DoubleType),
        StructField("generate_change_from_baseline", BooleanType),
        StructField("use_only_custom_timeseries", BooleanType)))
      spark.createDataFrame(Seq(Row("p1", 3.0, 3.0, 0.5, false, false)).asJava, schema)
    }
    val subjects = mkSubjects(nSubj, 50)
    val (summary, _) = SeriesGen.autogenSummary(
      mkCoverage(rows), params, subjects, "consecutive")
    val perGroup = summary.groupBy("parameter_id", "baseline")
      .count().collect().map(_.getLong(2))
    assert(perGroup.nonEmpty && perGroup.forall(_ <= nRanks),
      s"fold input must be <= #ranks rows per group: ${perGroup.toSeq}")
    // and the series still come out right
    val cfg = CtasConfig(autogenerate = "consecutive")
    val (dr, mr) = SeriesGen.autogenerateRelational(spark, mkCoverage(rows), params, subjects, cfg)
    assert(dr.count() >= 1)
    assert(mr.count() >= nSubj / 2)
  }

  test("size dispatch: both threshold sides of autogenerate agree") {
    // threshold 0 forces the relational branch, the default (4M) takes
    // the kernel branch on this small bitmap — outputs must be identical
    val subjects = mkSubjects(25, 4)
    val cov = mkCoverage(randomCoverage(seed = 404, nSubj = 25, nRanks = 7))
    val params = mkParams(0.4)
    val base = CtasConfig(autogenerate = "consecutive")
    val (dk, mk) = SeriesGen.autogenerate(spark, cov, params, subjects, base)
    val (dr, mr) = SeriesGen.autogenerate(spark, cov, params, subjects,
      base.copy(autogenBitmapRowsPerTaskMax = 0L))
    assert(collectDefs(dr) === collectDefs(dk))
    assert(collectMem(mr) === collectMem(mk))
  }
}
