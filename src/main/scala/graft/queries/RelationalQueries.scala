package graft.queries

import graft.Q
import graft.util.T
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2): every dplyr verb the
  * reference uses, re-expressed as a Catalyst-planned DataFrame query with
  * a DuckDB oracle. Scans stay declarative so predicate pushdown / column
  * pruning / broadcast joins apply; at 100 TB these plans shuffle only on
  * their aggregation or join keys and broadcast all dimension tables.
  *
  * Reference verbs covered here: select/filter (R/ctas.R:89,70),
  * group_by+summarise (R/ctas.R:823,879,317), left/inner/anti joins
  * (R/ctas.R:89,196,107), distinct (R/ctas.R:66,73), HAVING-style grouped
  * filters (R/ctas.R:202-204), window row_number (R/ctas.R:98), top-1 after
  * multi-key arrange (R/ctas.R:1029), bind_rows/union (R/ctas.R:130),
  * case_when (R/ctas.R:309-313), n_distinct (R/ctas.R:317), quantile
  * type-7 (R/ctas.R:1259-1261), correlation (R/ctas.R:1203).
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q_agg_sum",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            avg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
             |  avg(l_discount) AS avg_disc,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY 1, 2""".stripMargin)
    ),
    Q(
      "q_filter_in",
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_returnflag").isin("R", "A") && col("l_quantity") > 45)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem WHERE l_returnflag IN ('R','A') AND l_quantity > 45""".stripMargin)
    ),
    Q(
      "q_join_broadcast",
      (s, d) => {
        val c = T.customer(s, d)
        val n = broadcast(T.nation(s, d))
        val r = broadcast(T.region(s, d))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), sum(col("c_acctbal")).as("sum_bal"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust, sum(c_acctbal) AS sum_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2""".stripMargin)
    ),
    Q(
      "q_left_join_null",
      (s, d) => {
        val p = T.part(s, d)
        val l = T.lineitem(s, d)
        p.join(l, p("p_partkey") === l("l_partkey"), "left")
          .groupBy(col("p_brand"))
          .agg(
            count(col("l_orderkey")).as("n_sold"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT p_brand, count(l_orderkey) AS n_sold, count(*) AS n_rows
             |FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
             |GROUP BY 1""".stripMargin)
    ),
    Q(
      "q_anti_join",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_no_f_orders"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_no_f_orders
             |FROM customer ANTI JOIN (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |) o ON c_custkey = o_custkey
             |GROUP BY 1""".stripMargin)
    ),
    Q(
      "q_semi_join",
      (s, d) => {
        val sup = T.supplier(s, d)
        val l = T.lineitem(s, d).select("l_suppkey")
        sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_semi")
          .agg(count(lit(1)).as("n_active"), sum(col("s_acctbal")).as("sum_bal"))
      },
      Some("""SELECT count(*) AS n_active, sum(s_acctbal) AS sum_bal
             |FROM supplier SEMI JOIN lineitem ON s_suppkey = l_suppkey""".stripMargin)
    ),
    Q(
      "q_distinct",
      (s, d) => T.events(s, d).select("user_id", "event_type").distinct(),
      Some("SELECT DISTINCT user_id, event_type FROM events")
    ),
    Q(
      "q_having",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .filter(col("n_events") >= 70),
      Some("""SELECT user_id, count(*) AS n_events FROM events
             |GROUP BY 1 HAVING count(*) >= 70""".stripMargin)
    ),
    Q(
      "q_window_top1",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1""".stripMargin)
    ),
    Q(
      "q_window_running",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T.events(s, d)
          .withColumn("running_value",
            sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("event_id", "user_id", "running_value")
      },
      Some("""SELECT event_id, user_id,
             |  sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
             |FROM events""".stripMargin)
    ),
    Q(
      "q_window_lag",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T.events(s, d)
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .groupBy(col("user_id"))
          .agg(avg(col("value") - col("prev_value")).as("avg_step"))
      },
      Some("""SELECT user_id, avg(value - prev_value) AS avg_step FROM (
             |  SELECT user_id, value, lag(value, 1) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
             |  FROM events) GROUP BY 1""".stripMargin)
    ),
    Q(
      // percent_rank per group (the reference's test-prep verb,
      // tests/test_process_a_study.R:72)
      "q_window_percent_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        T.orders(s, d)
          .withColumn("pr", round(percent_rank().over(w), 9))
          .select("o_custkey", "o_orderkey", "pr")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(percent_rank() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice, o_orderkey), 9) AS pr
             |FROM orders""".stripMargin)
    ),
    Q(
      "q_union_all",
      (s, d) => {
        val e = T.events(s, d)
        val a = e.filter(col("event_type") === "click")
          .select(col("user_id"), lit("c").as("src"))
        val b = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), lit("p").as("src"))
        a.unionByName(b).groupBy(col("src"), col("user_id")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT src, user_id, count(*) AS n FROM (
             |  SELECT user_id, 'c' AS src FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, 'p' AS src FROM events WHERE event_type = 'purchase'
             |) GROUP BY 1, 2""".stripMargin)
    ),
    Q(
      "q_top10",
      (s, d) =>
        T.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
    ),
    Q(
      "q_count_distinct",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
             |  count(*) AS n_events FROM events GROUP BY 1""".stripMargin)
    ),
    Q(
      "q_case_when",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(lit(0.0)))
              .as("disc_rev"),
            sum(when(col("l_tax") > 0.04, lit(1L)).otherwise(lit(0L))).as("n_taxed")),
      Some("""SELECT l_returnflag,
             |  sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END) AS disc_rev,
             |  CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),
    Q(
      "q_corr",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(corr(col("l_quantity"), col("l_extendedprice")).as("qty_price_corr")),
      Some("""SELECT l_returnflag, corr(l_quantity, l_extendedprice) AS qty_price_corr
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),
    Q(
      "q_stddev",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            stddev_samp(col("value")).as("sd_value"),
            var_samp(col("value")).as("var_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value")),
      Some("""SELECT event_type, stddev_samp(value) AS sd_value,
             |  var_samp(value) AS var_value, min(value) AS min_value,
             |  max(value) AS max_value FROM events GROUP BY 1""".stripMargin)
    ),
    Q(
      // Exact type-7 quantiles (R/ctas.R:1259-1261 uses R type-7 = linear
      // interpolation; Spark `percentile` and DuckDB `quantile_cont` both
      // implement exactly that — NOT percentile_approx).
      "q_quantile_exact",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("percentile(o_totalprice, 0.25)").as("q1"),
            expr("percentile(o_totalprice, 0.5)").as("median"),
            expr("percentile(o_totalprice, 0.75)").as("q3")),
      Some("""SELECT o_orderpriority,
             |  quantile_cont(o_totalprice, 0.25) AS q1,
             |  quantile_cont(o_totalprice, 0.5) AS median,
             |  quantile_cont(o_totalprice, 0.75) AS q3
             |FROM orders GROUP BY 1""".stripMargin)
    ),
    Q(
      "q_date_trunc",
      (s, d) =>
        T.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value")),
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |  count(*) AS n, sum(value) AS sum_value FROM events GROUP BY 1""".stripMargin)
    )
  )
}
