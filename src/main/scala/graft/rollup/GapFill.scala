package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-fill before rollup (north_rule): densify each series to a complete
  * bucket grid, then LOCF or linear interpolation — all window
  * expressions, no UDFs (SURVEY.md §2.2 frame specs row).
  */
object GapFill {

  /** Expand each series to one row per bucket in [min, max] (step 1),
    * null value where no observation exists. seriesCols key the series;
    * bucketCol must be integral (e.g. an hour rank).
    */
  def densify(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String): DataFrame = {
    val grid = df
      .groupBy(seriesCols.map(col): _*)
      .agg(min(col(bucketCol)).as("__min_b"), max(col(bucketCol)).as("__max_b"))
      .select(seriesCols.map(col) :+
        explode(sequence(col("__min_b"), col("__max_b"))).as(bucketCol): _*)
    grid.join(df, seriesCols :+ bucketCol, "left")
  }

  /** Last-observation-carried-forward over each series. */
  def locf(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String, outCol: String = "value_filled"): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Densify + LOCF fused into ONE window pass — no grid join. Each
    * observed row explodes into its series' buckets
    * [bucket, next_bucket − 1] (the last row emits just its own bucket),
    * carrying the last non-null value forward. Output keys and `outCol`
    * values equal `locf(densify(df))` exactly (RollupSpec equivalence
    * test). Plan shape: the compositional form costs a per-series
    * min/max aggregation plus a shuffle JOIN of the full table against
    * the exploded grid, then the LOCF window's own
    * (series, bucket-sorted) exchange — three shuffles of which one
    * moves the whole table twice; here the gap rows are generated AFTER
    * the single exchange+sort that LOCF needs anyway, so the whole
    * operator is one shuffle. At 10^12 input rows the difference is an
    * entire extra pass of the table through the shuffle tier.
    *
    * `fillWhen` makes the fill SELECTIVE inside the same pass: rows where
    * it is false keep their own bucket and original value untouched (no
    * gap rows, no LOCF). A mixed table of fillable and pass-through
    * series (e.g. continuous metrics vs count-like metrics where a
    * missing hour means zero) then flows through ONE window pass instead
    * of filter-split + two branch scans + union — which at the source of
    * a derive pipeline also removes the persist the two branches would
    * otherwise force on their shared upstream.
    */
  def densifyLocf(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String, outCol: String = "value_filled",
      fillWhen: Column = lit(true)): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(bucketCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__fill", fillWhen)
      .withColumn("__locf", last(col(valueCol), ignoreNulls = true).over(wCum))
      .withColumn("__nb", lead(col(bucketCol), 1).over(w))
      .withColumn("__b",
        explode(when(col("__fill") && col("__nb").isNotNull && col("__nb") > col(bucketCol),
          sequence(col(bucketCol), col("__nb") - 1))
          .otherwise(array(col(bucketCol)))))
      .withColumn(outCol, when(col("__fill"), col("__locf")).otherwise(col(valueCol)))
      .drop("__fill", "__locf", "__nb", bucketCol)
      .withColumnRenamed("__b", bucketCol)
  }

  /** Linear interpolation between the nearest non-null neighbours;
    * endpoints fall back to LOCF / NOCB.
    */
  def linear(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String, outCol: String = "value_filled"): DataFrame = {
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val wPrev = part.orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = part.orderBy(col(bucketCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val obsBucket = when(col(valueCol).isNotNull, col(bucketCol))
    val prevV = last(col(valueCol), ignoreNulls = true).over(wPrev)
    val prevB = last(obsBucket, ignoreNulls = true).over(wPrev)
    val nextV = first(col(valueCol), ignoreNulls = true).over(wNext)
    val nextB = first(obsBucket, ignoreNulls = true).over(wNext)

    df
      .withColumn("__pv", prevV).withColumn("__pb", prevB)
      .withColumn("__nv", nextV).withColumn("__nb", nextB)
      .withColumn(outCol,
        when(col(valueCol).isNotNull, col(valueCol))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (col(bucketCol) - col("__pb")) / (col("__nb") - col("__pb")))
          .when(col("__pv").isNotNull, col("__pv"))
          .otherwise(col("__nv")))
      .drop("__pv", "__pb", "__nv", "__nb")
  }
}
