package graft.ctas

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic ctas-shaped study generator (FIXTURES.md §A, modeled on
  * data-raw/ctas_data.R's hierarchy: regions → countries ~Pois(3) → sites
  * ~Pois(4) → subjects ~Pois(5), per-subject timepoints ~Pois(20),
  * result ~ N(level ~ N(30,5), sd ~ U(1,10)), 30% MCAR missing). Uses its
  * own seeded RNG — the reference's test assertions are structural
  * (SURVEY.md §5.1), so exact R-RNG replication is not required.
  */
object FixtureGen {

  final class Rng(seed: Long) {
    private val r = new java.util.SplittableRandom(seed)
    def uniform(): Double = r.nextDouble()
    def uniform(lo: Double, hi: Double): Double = lo + (hi - lo) * r.nextDouble()
    def gaussian(mean: Double, sd: Double): Double = {
      // Box-Muller
      val u1 = math.max(r.nextDouble(), 1e-300)
      val u2 = r.nextDouble()
      mean + sd * math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
    def poisson(lambda: Double): Int = {
      // Knuth inversion (lambda small here)
      val l = math.exp(-lambda)
      var k = 0
      var p = 1.0
      while ({ p *= r.nextDouble(); p > l }) k += 1
      k
    }
  }

  case class Study(
      subjects: DataFrame,
      parameters: DataFrame,
      data: DataFrame,
      customTimeseries: DataFrame,
      customReferenceGroups: DataFrame) {
    def input: CtasInput =
      CtasInput(subjects, parameters, data, customTimeseries, customReferenceGroups)
  }

  private val letters = ('A' to 'Z').map(_.toString)
  private val tpNames: IndexedSeq[String] =
    for (i <- 0 until 26; j <- i + 1 until 26) yield s"${letters(i)}${letters(j)}"

  def generate(
      spark: SparkSession,
      seed: Long = 1L,
      regions: Int = 3,
      nParams: Int = 2,
      missingShare: Double = 0.3,
      withBaseline: Boolean = false,
      biasedSite: Option[String] = None): Study = {
    val rng = new Rng(seed)

    // hierarchy
    case class Subj(id: String, site: String, country: String, region: String)
    val subjects = collection.mutable.ArrayBuffer.empty[Subj]
    var subjSeq = 0
    for (ri <- 0 until regions) {
      val region = letters(ri)
      val nCountries = math.max(1, rng.poisson(3))
      for (ci <- 0 until nCountries) {
        val country = s"$region${letters(ci % 26)}"
        val nSites = math.max(1, rng.poisson(4))
        for (si <- 0 until nSites) {
          val site = s"$country${letters(si % 26)}"
          val nSubj = math.max(1, rng.poisson(5))
          for (_ <- 0 until nSubj) {
            subjSeq += 1
            subjects += Subj(subjSeq.toString, site, country, region)
          }
        }
      }
    }

    // per-subject timepoint counts
    val tpCount = subjects.map(_ => math.max(2, rng.poisson(20))).toArray

    val dataRows = collection.mutable.ArrayBuffer.empty[Row]
    for (p <- 1 to nParams) {
      val paramId = s"param$p"
      subjects.zipWithIndex.foreach { case (s, i) =>
        val bias = if (biasedSite.contains(s.site)) 25.0 else 0.0
        val level = rng.gaussian(30, 5) + bias
        val sd = rng.uniform(1, 10)
        val baseVal = if (withBaseline) Some(rng.gaussian(30, 5)) else None
        for (rank <- 1 to tpCount(i)) {
          val missing = rng.uniform() < missingShare
          val res: Any = if (missing) null else rng.gaussian(level, sd)
          dataRows += Row(
            s.id, paramId, tpNames(rank - 1), null,
            rank.toDouble, res, baseVal.orNull)
        }
      }
    }

    val dataSchema = StructType(Seq(
      StructField("subject_id", StringType),
      StructField("parameter_id", StringType),
      StructField("timepoint_1_name", StringType),
      StructField("timepoint_2_name", StringType),
      StructField("timepoint_rank", DoubleType),
      StructField("result", DoubleType),
      StructField("baseline", DoubleType)))

    val subjSchema = StructType(Seq(
      StructField("subject_id", StringType),
      StructField("site", StringType),
      StructField("country", StringType),
      StructField("region", StringType)))

    val paramSchema = StructType(Seq(
      StructField("parameter_id", StringType),
      StructField("parameter_name", StringType),
      StructField("parameter_category_1", StringType),
      StructField("parameter_category_2", StringType),
      StructField("parameter_category_3", StringType),
      StructField("time_point_count_min", DoubleType),
      StructField("subject_count_min", DoubleType),
      StructField("max_share_missing", DoubleType),
      StructField("generate_change_from_baseline", BooleanType),
      StructField("timeseries_features_to_calculate", StringType),
      StructField("use_only_custom_timeseries", BooleanType)))

    val paramRows = (1 to nParams).map { p =>
      Row(s"param$p", s"Parameter $p", null, null, null,
        null, null, null, null, null, null)
    }

    val emptyCustomTs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("timeseries_id", StringType),
        StructField("parameter_id", StringType),
        StructField("timepoint_combo", StringType))))

    val emptyRefGroups = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("parameter_id", StringType),
        StructField("feature", StringType),
        StructField("ref_group", StringType))))

    Study(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          subjects.map(s => Row(s.id, s.site, s.country, s.region)).toSeq, 4),
        subjSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(paramRows, 1), paramSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(dataRows.toSeq, 8), dataSchema),
      emptyCustomTs,
      emptyRefGroups)
  }
}
