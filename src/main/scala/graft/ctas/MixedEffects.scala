package graft.ctas

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mixed-effects site scoring (fit_mixed_effects_model, R/ctas.R:1215-1248).
  * Scheduled last per SURVEY.md §7.4.3 — implemented in a later milestone
  * as an executor-local variance-components EM + seeded random-effect
  * simulation inside mapGroups.
  */
object MixedEffects {
  def score(spark: SparkSession, eligible: DataFrame, cfg: CtasConfig): DataFrame =
    throw new UnsupportedOperationException(
      "mixedeffects site scoring not yet implemented (see SURVEY.md §7.4.3)")
}
