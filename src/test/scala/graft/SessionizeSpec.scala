package graft

import graft.rollup.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends GraftSuite {
  import spark.implicits._

  test("sessions break exactly at gaps > threshold") {
    val df = Seq(
      ("u1", 0.0), ("u1", 10.0), ("u1", 100.0), ("u1", 105.0), ("u1", 300.0),
      ("u2", 50.0))
      .toDF("user", "t")
    val out = Sessionize.assign(df, Seq("user"), "t", gap = 30.0)
      .orderBy("user", "t").select("user", "t", "session_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("u1", 0.0, 0L), ("u1", 10.0, 0L), ("u1", 100.0, 1L), ("u1", 105.0, 1L),
      ("u1", 300.0, 2L), ("u2", 50.0, 0L)))
  }

  test("equals brute-force sessionization on randomized event streams") {
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val rows = for {
        k <- 0 until 6; _ <- 0 until 40
        if rng.nextDouble() < 0.7
      } yield (s"u$k", rng.nextInt(5000).toDouble)
      val gap = 120.0
      val got = Sessionize.assign(rows.toDF("user", "t"), Seq("user"), "t", gap)
        .select("user", "t", "session_id").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).toSet).toMap

      val expect = rows.groupBy(_._1).flatMap { case (k, es) =>
        val ts = es.map(_._2).sorted
        var sid = -1L
        var prev = Double.NegativeInfinity
        ts.map { t =>
          if (t - prev > gap) sid += 1
          prev = t
          ((k, t), sid)
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(got === expect, s"trial $trial")
    }
  }

  test("stats aggregates count/start/end/duration per session") {
    val df = Seq(("u1", 0.0), ("u1", 10.0), ("u1", 100.0)).toDF("user", "t")
    val out = Sessionize.stats(df, Seq("user"), "t", gap = 30.0)
      .orderBy("session_id")
      .select("session_id", "n_events", "session_start", "session_end", "duration")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq((0L, 2L, 0.0, 10.0, 10.0), (1L, 1L, 100.0, 100.0, 0.0)))
  }

  test("timestamp time columns are accepted (normalized to epoch seconds)") {
    val df = Seq(("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:10")),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 02:00:00")))
      .toDF("user", "ts")
    val out = Sessionize.stats(df, Seq("user"), "ts", gap = 3600.0)
      .orderBy("session_id").select("session_id", "n_events", "duration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0L, 2L, 10.0), (1L, 1L, 0.0)))
    // NTZ flavour too (the ANSI cast trap: NTZ has no direct double cast)
    val ntz = df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(Sessionize.assign(ntz, Seq("user"), "ts", 3600.0)
      .where(col("session_id") === 1).count() === 1)
  }

  test("session_window kernel (StreamingSessionize, batch mode) equals " +
    "batch sessionize stats away from exact-gap ties") {
    // integer-second events + a fractional gap: the strict (<) streaming
    // boundary and the inclusive (<=) batch boundary can never disagree
    val rng = new scala.util.Random(17)
    val rows = for (k <- 0 until 5; _ <- 0 until 60)
      yield (s"u$k", rng.nextInt(500000).toDouble)
    val df = rows.toDF("user_id", "t")
      .withColumn("ts", timestamp_seconds(col("t")))
    val viaWindow = graft.streaming.StreamingSessionize
      .sessionStats(df, "user_id", "ts", "999 seconds 500 milliseconds")
      .select("user_id", "n_events", "session_start", "session_end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sorted.toSeq
    val viaBatch = Sessionize.stats(df.drop("ts"), Seq("user_id"), "t", gap = 999.5)
      .select("user_id", "n_events", "session_start", "session_end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sorted.toSeq
    assert(viaWindow === viaBatch)
  }

  test("plans one exchange (lag and running sum share the sort)") {
    val df = Seq(("u1", 0.0)).toDF("user", "t")
    val plan = Sessionize.assign(df, Seq("user"), "t", 30.0)
      .queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx == 1, s"expected one exchange, found $nEx:\n$plan")
    assert(!plan.contains("Join"), plan)
  }
}
