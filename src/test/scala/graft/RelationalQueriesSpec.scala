package graft

import org.apache.spark.sql.Row

class RelationalQueriesSpec extends GraftSuite {

  test("every registered query runs on sf0.001 and has stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfTiny)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // force execution
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
    }
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet.diff(qs)
    assert(extra.isEmpty, s"oracle entries without query: $extra")
  }

  test("q_agg_sum groups by (returnflag, linestatus) with positive sums") {
    val rows = SparkEntry.queries("q_agg_sum")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("cnt") > 0)
    }
  }

  test("q_window_top1 returns exactly one row per customer") {
    val df = SparkEntry.queries("q_window_top1")(spark, sfTiny)
    val total = df.count()
    val custs = df.select("o_custkey").distinct().count()
    assert(total === custs)
  }

  test("q_anti_join + semi_join partition the key space") {
    import org.apache.spark.sql.functions._
    val c = spark.read.parquet(s"$sfTiny/customer.parquet")
    val o = spark.read.parquet(s"$sfTiny/orders.parquet").select("o_custkey")
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti + semi === c.count())
  }

  test("q_quantile_exact median lies within min/max") {
    val rows = SparkEntry.queries("q_quantile_exact")(spark, sfTiny).collect()
    rows.foreach { r =>
      val q1 = r.getAs[Double]("q1")
      val med = r.getAs[Double]("median")
      val q3 = r.getAs[Double]("q3")
      assert(q1 <= med && med <= q3)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
