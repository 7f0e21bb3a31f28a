package graft

import graft.rollup.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends GraftSuite {
  import spark.implicits._

  test("asof equals per-row brute force on randomized keyed series " +
      "(backward, forward, nearest; with and without tolerance)") {
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 3; dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(50.0))) {
      val leftRows = for {
        k <- 0 until 5; i <- 0 until 30
        if rng.nextDouble() < 0.6
      } yield (s"k$k", rng.nextInt(1000).toDouble, i)
      val rightRows = (for {
        k <- 0 until 5; _ <- 0 until 20
        if rng.nextDouble() < 0.6
      } yield (s"k$k", rng.nextInt(1000).toDouble)).distinct
        .map { case (k, t) => (k, t, rng.nextInt(100).toDouble) }
      val left = leftRows.toDF("key", "lt", "id")
      val right = rightRows.toDF("key", "rt", "rv")

      val got = AsOfJoin.asof(left, right, Seq("key"), "lt", "rt", Seq("rv"),
        tolerance = tol, direction = dir)
        .select("key", "lt", "id", "rv", "asof_time")
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))
        .toSet

      def pick(k: String, lt: Double): Option[(String, Double, Double)] = {
        def ok(d: Double) = tol.forall(d <= _)
        val back = rightRows.filter(r => r._1 == k && r._2 <= lt && ok(lt - r._2))
          .sortBy(_._2).lastOption
        val fwd = rightRows.filter(r => r._1 == k && r._2 >= lt && ok(r._2 - lt))
          .sortBy(_._2).headOption
        dir match {
          case "backward" => back
          case "forward"  => fwd
          case _ => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (lt - b._2 <= f._2 - lt) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
        }
      }
      val expect = leftRows.map { case (k, lt, id) =>
        pick(k, lt) match {
          case Some(m) => (k, lt, id, m._3.asInstanceOf[Any], m._2.asInstanceOf[Any])
          case None    => (k, lt, id, null, null)
        }
      }.toSet
      assert(got === expect, s"trial $trial dir $dir tol $tol")
    }
  }

  test("ties match backward-inclusive; unmatched lefts keep nulls") {
    val left = Seq(("a", 10.0, 1), ("a", 5.0, 2), ("b", 1.0, 3)).toDF("key", "lt", "id")
    val right = Seq(("a", 10.0, 99.0), ("a", 7.0, 77.0), ("b", 2.0, 22.0)).toDF("key", "rt", "rv")
    val out = AsOfJoin.asof(left, right, Seq("key"), "lt", "rt", Seq("rv"))
      .orderBy("id").select("id", "rv").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out.toSeq === Seq((1, 99.0), (2, null), (3, null)))
  }

  test("a null right value is attached as null, not skipped to an older row") {
    val left = Seq(("a", 10.0, 1)).toDF("key", "lt", "id")
    val right = Seq(("a", 3.0, Some(33.0)), ("a", 8.0, None)).toDF("key", "rt", "rv")
    val out = AsOfJoin.asof(left, right, Seq("key"), "lt", "rt", Seq("rv"))
      .select("rv", "asof_time").collect()(0)
    assert(out.isNullAt(0), "must attach the matched row's null")
    assert(out.getDouble(1) === 8.0, "matched time is the latest row's")
  }

  test("tolerance nulls matches older than the bound") {
    val left = Seq(("a", 100.0, 1), ("a", 12.0, 2)).toDF("key", "lt", "id")
    val right = Seq(("a", 10.0, 7.0)).toDF("key", "rt", "rv")
    val out = AsOfJoin.asof(left, right, Seq("key"), "lt", "rt", Seq("rv"),
      tolerance = Some(5.0))
      .orderBy("id").select("id", "rv").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out.toSeq === Seq((1, null), (2, 7.0)))
  }

  test("reserved-name collisions are rejected (asof_time and __ prefix)") {
    val r = Seq(("a", 3.0, 33.0)).toDF("key", "rt", "rv")
    val lReserved = Seq(("a", 10.0, 1.0)).toDF("key", "lt", "asof_time")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(lReserved, r, Seq("key"), "lt", "rt", Seq("rv"))
    }
    val l = Seq(("a", 10.0)).toDF("key", "lt")
    val rDunder = Seq(("a", 3.0, 33.0)).toDF("key", "rt", "__rv")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, rDunder, Seq("key"), "lt", "rt", Seq("__rv"))
    }
  }

  test("plans no join and exactly one exchange") {
    val left = Seq(("a", 10.0, 1)).toDF("key", "lt", "id")
    val right = Seq(("a", 3.0, 33.0)).toDF("key", "rt", "rv")
    val plan = AsOfJoin.asof(left, right, Seq("key"), "lt", "rt", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx == 1, s"expected one exchange, found $nEx:\n$plan")
  }
}
