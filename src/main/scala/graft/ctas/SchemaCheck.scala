package graft.ctas

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input validation reproducing check_input_data (R/ctas.R:1048-1187):
  * required tables non-empty, expected columns present, column types
  * (string/double/boolean — with the all-null-optional skip rule), and the
  * domain checks. Fails with IllegalArgumentException carrying messages
  * equivalent to the reference's stop() strings.
  */
object SchemaCheck {

  // (table, column, type, valuesExpected) — R/ctas.R:1054-1086
  private val expected: Seq[(String, String, String, Boolean)] = Seq(
    ("subjects", "country", "character", true),
    ("subjects", "subject_id", "character", true),
    ("subjects", "site", "character", true),
    ("subjects", "region", "character", false),
    ("parameters", "parameter_id", "character", true),
    ("parameters", "parameter_category_1", "character", false),
    ("parameters", "parameter_category_2", "character", false),
    ("parameters", "parameter_category_3", "character", false),
    ("parameters", "parameter_name", "character", true),
    ("parameters", "time_point_count_min", "numeric", false),
    ("parameters", "subject_count_min", "numeric", false),
    ("parameters", "max_share_missing", "numeric", false),
    ("parameters", "generate_change_from_baseline", "logical", false),
    ("parameters", "timeseries_features_to_calculate", "character", false),
    ("parameters", "use_only_custom_timeseries", "logical", false),
    ("data", "subject_id", "character", true),
    ("data", "parameter_id", "character", true),
    ("data", "timepoint_1_name", "character", true),
    ("data", "timepoint_2_name", "character", false),
    ("data", "timepoint_rank", "numeric", true),
    ("data", "result", "numeric", true),
    ("data", "baseline", "numeric", false),
    ("custom_reference_groups", "parameter_id", "character", true),
    ("custom_reference_groups", "feature", "character", true),
    ("custom_reference_groups", "ref_group", "character", true),
    ("custom_timeseries", "timeseries_id", "character", true),
    ("custom_timeseries", "parameter_id", "character", true),
    ("custom_timeseries", "timepoint_combo", "character", true))

  private def typeOk(dt: DataType, rType: String): Boolean = rType match {
    case "character" => dt == StringType
    case "numeric"   => dt.isInstanceOf[NumericType]
    case "logical"   => dt == BooleanType
  }

  def validate(in: CtasInput, cfg: CtasConfig): Unit = {
    val tables = Map(
      "subjects" -> in.subjects,
      "parameters" -> in.parameters,
      "data" -> in.data,
      "custom_reference_groups" -> in.customReferenceGroups,
      "custom_timeseries" -> in.customTimeseries)

    // Fused validation aggregates (one job per table instead of separate
    // isEmpty / duplicate-id / subject_count_min jobs — each extra action
    // re-ran the whole derivation of these tables): subjects gets
    // (row count, distinct ids) in one pass, parameters gets
    // (row count, #rows with subject_count_min < 2). The five per-table
    // probes are INDEPENDENT read-only actions, so they run concurrently
    // (guide §2.6 — overlap independent jobs; each probe is mostly scan
    // latency on the same fact table, and sequentially they serialized
    // ~3 input scans). Results are AWAITED in the original order, so the
    // check ORDER below is unchanged — emptiness first, then
    // columns/types, then the domain checks — and every failure raises
    // the same message as before.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val subjProbe: Future[(Long, Boolean)] = Future {
      if (in.subjects.columns.contains("subject_id")) {
        val r = in.subjects.agg(
          count(lit(1)), count(col("subject_id")), countDistinct(col("subject_id")))
          .collect()(0)
        val n = r.getLong(0); val nonNull = r.getLong(1); val distinct = r.getLong(2)
        // dup iff some id group (including the null group) has > 1 member
        (n, nonNull > distinct || (n - nonNull) > 1)
      } else
        // missing column: the column check in the loop below raises the
        // reference's message; only emptiness is probed here
        (if (in.subjects.isEmpty) 0L else 1L, false)
    }
    val paramProbe: Future[(Long, Long)] = Future {
      val scmCnt =
        if (in.parameters.columns.contains("subject_count_min"))
          sum(when(col("subject_count_min") < 2, 1L).otherwise(0L))
        else lit(0L).cast("long")
      val r = in.parameters.agg(count(lit(1)), coalesce(scmCnt, lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val emptyProbe: Map[String, Future[Boolean]] =
      Seq("data", "custom_reference_groups", "custom_timeseries")
        .map(n => n -> Future { tables(n).isEmpty }).toMap
    val (nSubjects, subjectDupExists) = Await.result(subjProbe, Duration.Inf)
    val (nParameters, nScmBelowTwo) = Await.result(paramProbe, Duration.Inf)

    tables.foreach { case (name, df) =>
      val empty = name match {
        case "subjects"   => nSubjects == 0L
        case "parameters" => nParameters == 0L
        case _            => Await.result(emptyProbe(name), Duration.Inf)
      }
      if (empty) {
        if (name == "custom_reference_groups" || name == "custom_timeseries") ()
        else fail(s"The data frame $name is empty!")
      } else {
        val cols = df.columns.toSet
        val exp = expected.filter(_._1 == name)
        val missing = exp.map(_._2).filterNot(cols.contains)
        if (missing.nonEmpty)
          fail(s"The data frame $name is missing the following columns: ${missing.mkString(", ")}")
        exp.foreach { case (_, colName, rType, required) =>
          val dt = df.schema(colName).dataType
          if (!typeOk(dt, rType)) {
            // The type test is skipped iff the column is optional and
            // all-null (R/ctas.R:1133-1138); only scan when the declared
            // type already fails, so the common case runs no job.
            val allNull = !required && (dt == NullType ||
              df.filter(col(colName).isNotNull).isEmpty)
            if (!allNull)
              fail(s"Column $colName in $name must be of type $rType!")
          }
        }
      }
    }

    // subject_count_min >= 2 per parameter (R/ctas.R:1154-1158) — from
    // the fused parameters aggregate above
    if (nScmBelowTwo > 0L)
      fail("Some parameters' subject_count_min parameter is below two!")

    // allowed feature names (R/ctas.R:1151, 1162-1163)
    val feats = cfg.defaultFeatures.split(";").toSeq
    if (!feats.forall(CtasSchema.allowedFeatures.contains))
      fail("The argument 'timeseries_features_to_calculate' contains illegal values!")

    if (cfg.defaultMaxShareMissing.isNaN ||
      cfg.defaultMaxShareMissing < 0 || cfg.defaultMaxShareMissing > 1)
      fail("Argument default_max_share_missing_timepoints_per_series must be between 0 and 1!")

    if (cfg.defaultMinSubjects < 2)
      fail("Minimum value for default_minimum_subjects_per_series is two!")

    if (cfg.autogenerate == "off" &&
      Await.result(emptyProbe("custom_timeseries"), Duration.Inf))
      fail("Custom timeseries must be defined if autogenerate_timeseries is set to FALSE!")

    // unique subject ids (R/ctas.R:1179-1185) — from the fused subjects
    // aggregate above
    if (subjectDupExists)
      fail("There are replicate subject IDs in the subjects df!")
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
}
