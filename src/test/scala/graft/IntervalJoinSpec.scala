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
