package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample()` / `rand(seed)` are partitioning-dependent: the same
  * seed selects different rows when the scan splits differently, so a
  * re-run after a repartition (or on a different engine) yields a
  * different corpus — unacceptable when the sample defines a training
  * set that must be auditable and reproducible. Content-hash sampling
  * fixes that: a row is kept iff the first 8 hex chars of
  * `md5(key)` — a uniform 32-bit integer in hex — sort below the
  * rate's 8-hex threshold. md5 of a string is bit-identical in every
  * engine (Spark, DuckDB, Trino, Python), so the SAME rows are chosen
  * everywhere, forever, regardless of partitioning, ordering, or
  * cluster size. Pure codegen'd expressions — the filter pushes into
  * the scan, no shuffle, no state.
  *
  * The lexicographic comparison is exact: fixed-width lowercase hex
  * orders identically to the integer it encodes.
  */
object Sampling {

  /** 8-hex-char threshold for a rate in [0,1]: floor(rate·2³²) zero-
    * padded. rate=1 would need 9 chars, so it is special-cased by
    * [[keep]].
    */
  private[sampling] def hexThreshold(rate: Double): String =
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"

  /** keep-predicate selecting a deterministic ~`rate` fraction of rows,
    * keyed on a stable row identity (id, url — NOT a value that changes
    * between runs). Null keys are never kept (md5 of null is null).
    */
  def keep(key: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    if (rate >= 1.0) key.isNotNull
    else if (rate <= 0.0) lit(false)
    else substring(md5(key.cast("string").cast("binary")), 1, 8) < lit(hexThreshold(rate))
  }

  /** Deterministic per-stratum sampling — the training-mix primitive
    * ("keep 60% of en, 10% of everything else"). One codegen'd
    * predicate, no shuffle; rates outside [0,1] rejected eagerly.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1]: $r"))
    val pred = rates.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, rate)) =>
        acc.when(col(stratumCol) === stratum, keep(col(keyCol), rate))
    }.otherwise(keep(col(keyCol), defaultRate))
    df.filter(pred)
  }
}
