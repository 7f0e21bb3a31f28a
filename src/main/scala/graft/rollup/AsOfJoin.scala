package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the closest right row on the
  * same key at or before it (`direction = "backward"`, the default), at
  * or after it (`"forward"`), or whichever is nearer (`"nearest"`,
  * backward on ties) — optionally within a `tolerance`. The classic
  * time-series lookup ("which baseline/quote was in force when this
  * event happened") that plain equi-joins cannot express and a naive
  * range join turns into a per-key cartesian.
  *
  * Plan shape: NO join at all. The two sides are tagged and unioned,
  * then ONE window pass per key ordered by (time, side) carries the
  * matching right row onto the left rows — right sorts before left at
  * equal timestamps for backward (after, for forward), so ties match
  * inclusively in both directions, like DuckDB's `ASOF JOIN` with
  * `l.t >= r.t` / `l.t <= r.t`. Cost is a single exchange + sort of
  * |left| + |right| rows ("nearest" adds a second sort on the same
  * partitioning, still one exchange) — the shuffle a shuffle-hash
  * equi-join would pay anyway, with no build side and no range
  * explosion (AsOfJoinSpec asserts the no-join single-exchange shape;
  * driver oracles `q_asof_join` / `q_asof_join_forward` pin results
  * against DuckDB's native ASOF LEFT JOIN in both directions).
  *
  * Semantics notes:
  *  - left rows with no matching right row keep nulls (left-join
  *    semantics, DuckDB `ASOF LEFT JOIN`);
  *  - the matched right row is carried as a WHOLE struct, so a null in
  *    one right value column is attached as that null (a per-column
  *    carry would instead skip to a farther row for that column);
  *  - if several right rows share (key, time), the carried row is the
  *    sort-tie winner — deduplicate the right side per (key, time) for
  *    deterministic output, as any asof engine requires;
  *  - `tolerance` (in units of the time column) nulls the attached
  *    values when the matched right row is farther than the tolerance;
  *    for "nearest" it applies per direction before picking.
  *
  * Hot-key bound: partitioning is by key only, so one key's FULL
  * history (left + right) sorts and carries in one task — the same
  * placement any shuffle join on the key would force. Both stages
  * degrade to disk rather than cliff: the sort is an
  * UnsafeExternalSorter (spills), and the running-frame carry holds
  * O(1) state per row (SkewSpec drives a 10⁷-row single key through
  * it). Per-key cost is one external sort of that key's rows; if a
  * single key's history ever exceeds a task's DISK, range-bucket the
  * time axis and fix up carries across bucket boundaries (two-level
  * carry) — not needed at 10⁹ rows/key.
  */
object AsOfJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Double] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"unknown asof direction: $direction")
    val collisions = valueCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")} — alias them first")
    // internal names and the appended output column are reserved too
    // (ADVICE r04): a left frame already holding asof_time or a __-prefixed
    // column would be silently clobbered by the tag-union plumbing
    val reserved = (left.columns ++ right.columns)
      .filter(c => c == "asof_time" || c.startsWith("__")).distinct
    require(reserved.isEmpty,
      s"columns collide with asof internals: ${reserved.mkString(", ")} — " +
        "rename them first (asof_time and the __ prefix are reserved)")

    val leftCols = left.columns.toSeq
    // one unioned relation; left rows carry nulls in the right value slots
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(TimeCols.epochSeconds(right, rightTime).as("__t"), lit(0).as("__side")) ++
        valueCols.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(TimeCols.epochSeconds(left, leftTime).as("__t"), lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // backward: right(side 0) sorts BEFORE left at equal time, cumulative
    // frame => last right with rt <= t, ties inclusive. forward: right
    // sorts AFTER left at equal time, following frame => first right with
    // rt >= t, ties inclusive. Same hash partitioning either way.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // the matched right row travels as one struct (non-null exactly on
    // right rows), so the attach is atomic per row
    val rightRow = when(col("__side") === 0,
      struct(col("__t").as("__rt") +: valueCols.map(col): _*))
    val unioned = taggedRight.unionByName(taggedLeft)
    val carried = direction match {
      case "backward" => unioned.withColumn("__mb", last(rightRow, ignoreNulls = true).over(wB))
      case "forward"  => unioned.withColumn("__mf", first(rightRow, ignoreNulls = true).over(wF))
      case _ => unioned
        .withColumn("__mb", last(rightRow, ignoreNulls = true).over(wB))
        .withColumn("__mf", first(rightRow, ignoreNulls = true).over(wF))
    }

    def okWithin(m: Column, delta: Column): Column = tolerance match {
      case Some(tol) => m.isNotNull && delta <= tol
      case None      => m.isNotNull
    }
    lazy val db = col("__t") - col("__mb").getField("__rt")
    lazy val df_ = col("__mf").getField("__rt") - col("__t")
    val matchedRow: Column = direction match {
      case "backward" => when(okWithin(col("__mb"), db), col("__mb"))
      case "forward"  => when(okWithin(col("__mf"), df_), col("__mf"))
      case _ =>
        val okB = okWithin(col("__mb"), db)
        val okF = okWithin(col("__mf"), df_)
        when(okB && okF, when(db <= df_, col("__mb")).otherwise(col("__mf")))
          .when(okB, col("__mb"))
          .when(okF, col("__mf"))
    }

    carried
      .filter(col("__side") === 1)
      .withColumn("__m", matchedRow)
      .select(
        leftCols.map(col) ++
          valueCols.map(c => col("__m").getField(c).as(c)) :+
          col("__m").getField("__rt").as("asof_time"): _*)
  }
}
