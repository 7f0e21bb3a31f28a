package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the latest right row
  * with `right.time <= left.time` on the same key (optionally within a
  * tolerance). The classic time-series lookup ("which baseline/quote was
  * in force when this event happened") that plain equi-joins cannot
  * express and a naive range join turns into a per-key cartesian.
  *
  * Plan shape: NO join at all. The two sides are tagged and unioned,
  * then ONE window pass per key ordered by (time, side) carries the most
  * recent right row forward onto the left rows (right sorts before left
  * at equal timestamps, so ties match backward-inclusive, like DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`). Cost is a single exchange + sort of
  * |left| + |right| rows — the shuffle a shuffle-hash equi-join would
  * pay anyway, with no build side and no range explosion (PlanSpec
  * asserts the no-join single-exchange shape; the driver oracle
  * `q_asof_join` pins results against DuckDB's native ASOF LEFT JOIN).
  *
  * Semantics notes:
  *  - left rows with no matching right row keep nulls (left-join
  *    semantics, DuckDB `ASOF LEFT JOIN`);
  *  - the matched right row is carried as a WHOLE struct, so a null in
  *    one right value column is attached as that null (a per-column
  *    carry would instead skip back to an older row for that column);
  *  - if several right rows share (key, time), the carried row is the
  *    sort-tie winner — deduplicate the right side per (key, time) for
  *    deterministic output, as any asof engine requires;
  *  - `tolerance` (in units of the time column) nulls the attached
  *    values when the matched right row is older than the tolerance.
  */
object AsOfJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Double] = None): DataFrame = {
    val collisions = valueCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")} — alias them first")

    val leftCols = left.columns.toSeq
    // one unioned relation; left rows carry nulls in the right value slots
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast("double").as("__t"), lit(0).as("__side")) ++
        valueCols.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).cast("double").as("__t"), lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // the matched right row travels as one struct (non-null exactly on
    // right rows), so LOCF attaches the row atomically
    val rightRow = when(col("__side") === 0,
      struct(col("__t").as("__rt") +: valueCols.map(col): _*))
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(rightRow, ignoreNulls = true).over(w))

    val matched = tolerance match {
      case Some(tol) =>
        col("__m").isNotNull && (col("__t") - col("__m").getField("__rt")) <= tol
      case None => col("__m").isNotNull
    }
    carried
      .filter(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          valueCols.map(c => when(matched, col("__m").getField(c)).otherwise(lit(null)).as(c)) :+
          when(matched, col("__m").getField("__rt")).otherwise(lit(null)).as("asof_time"): _*)
  }
}
