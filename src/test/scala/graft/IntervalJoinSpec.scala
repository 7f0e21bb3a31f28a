package graft

import graft.rollup.IntervalJoin
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends GraftSuite {
  import spark.implicits._

  test("equals brute-force BETWEEN join on randomized points and intervals") {
    val rng = new scala.util.Random(41)
    for (trial <- 1 to 3; width <- Seq(7.0, 50.0, 1000.0)) {
      val pts = for {
        k <- 0 until 4; i <- 0 until 40
        if rng.nextDouble() < 0.7
      } yield (s"k$k", rng.nextInt(1000).toDouble, i)
      val ivs = for {
        k <- 0 until 4; j <- 0 until 15
        if rng.nextDouble() < 0.7
      } yield {
        val lo = rng.nextInt(1000).toDouble
        (s"k$k", lo, lo + rng.nextInt(120), j)
      }
      val got = IntervalJoin.pointInInterval(
        pts.toDF("key", "t", "pid"), ivs.toDF("key", "lo", "hi", "iid"),
        Seq("key"), "t", "lo", "hi", bucketWidth = width)
        .select("key", "pid", "iid").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
      val expect = (for {
        (pk, t, pid) <- pts
        (ik, lo, hi, iid) <- ivs
        if pk == ik && t >= lo && t <= hi
      } yield (pk, pid, iid)).sorted
      assert(got === expect, s"trial $trial width $width")
    }
  }

  test("inverted and null-bound intervals drop; bounds are inclusive") {
    val pts = Seq(("a", 10.0, 1), ("a", 11.0, 2)).toDF("key", "t", "pid")
    val ivs = Seq(
      ("a", Some(10.0), Some(10.0), 10), // degenerate point-interval: catches t=10 only
      ("a", Some(20.0), Some(5.0), 11),  // inverted: dropped
      ("a", None, Some(30.0), 12))       // null bound: dropped
      .toDF("key", "lo", "hi", "iid")
    val out = IntervalJoin.pointInInterval(pts, ivs, Seq("key"), "t", "lo", "hi", 8.0)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq === Seq((1, 10)))
  }

  test("intervalOverlap equals brute-force range join on randomized " +
    "intervals, across bucket widths (each pair exactly once)") {
    val rng = new scala.util.Random(43)
    for (trial <- 1 to 3; width <- Seq(7.0, 50.0, 1000.0)) {
      val ls = for {
        k <- 0 until 4; i <- 0 until 25
        if rng.nextDouble() < 0.7
      } yield {
        val lo = rng.nextInt(1000).toDouble
        (s"k$k", lo, lo + rng.nextInt(200), i)
      }
      val rs = for {
        k <- 0 until 4; j <- 0 until 25
        if rng.nextDouble() < 0.7
      } yield {
        val lo = rng.nextInt(1000).toDouble
        (s"k$k", lo, lo + rng.nextInt(200), j)
      }
      val got = IntervalJoin.intervalOverlap(
        ls.toDF("key", "lo1", "hi1", "lid"), rs.toDF("key", "lo2", "hi2", "rid"),
        Seq("key"), "lo1", "hi1", "lo2", "hi2", bucketWidth = width)
        .select("key", "lid", "rid").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
      val expect = (for {
        (lk, lo1, hi1, lid) <- ls
        (rk, lo2, hi2, rid) <- rs
        if lk == rk && lo1 <= hi2 && lo2 <= hi1
      } yield (lk, lid, rid)).sorted
      assert(got === expect, s"trial $trial width $width")
      assert(got.distinct.length === got.length, "a pair met more than once")
    }
  }

  test("fan-out guard fails an oversized interval with an actionable error") {
    val pts = Seq(("a", 10.0)).toDF("key", "t")
    val ivs = Seq(("a", 0.0, 1e9)).toDF("key", "lo", "hi") // 1e8 buckets at w=10
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(pts, ivs, Seq("key"), "t", "lo", "hi", 10.0,
        maxFanout = 1000L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("maxFanout") && m.contains("bucketWidth")),
      s"unhelpful error: ${msgs(ex).mkString(" | ")}")
  }

  test("intervalOverlap plans a shuffle equi-join, never a nested loop") {
    val ls = Seq(("a", 5.0, 15.0)).toDF("key", "lo1", "hi1")
    val rs = Seq(("a", 10.0, 20.0)).toDF("key", "lo2", "hi2")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = IntervalJoin.intervalOverlap(ls, rs, Seq("key"),
        "lo1", "hi1", "lo2", "hi2", 10.0).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set(key, saved)
  }

  test("plans a shuffle equi-join, never a nested loop or cartesian") {
    val pts = Seq(("a", 10.0)).toDF("key", "t")
    val ivs = Seq(("a", 5.0, 15.0)).toDF("key", "lo", "hi")
    // disable broadcast so the 'big data' plan shape is what we assert
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = IntervalJoin.pointInInterval(pts, ivs, Seq("key"), "t", "lo", "hi", 10.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set(key, saved)
  }
}
