package graft

import graft.rollup.Tiers
import graft.sketch.HeavyHitters
import org.apache.spark.sql.functions._

import scala.util.Random

class SketchSpec extends GraftSuite {
  import spark.implicits._

  // deterministic zipf-ish stream: a few genuinely heavy items, a long
  // uniform tail
  private def skewedItems(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    (1 to n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) "h1"
      else if (r < 0.45) "h2"
      else if (r < 0.53) "h3"
      else s"t${rnd.nextInt(5000)}"
    }
  }

  test("Misra-Gries candidates contain every item with count > n/k, " +
    "estimates within n/k, across partitionings") {
    val data = skewedItems(20000, seed = 7)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    for (parts <- Seq(1, 4, 13); k <- Seq(5, 10, 50)) {
      val df = data.toDF("item").repartition(parts)
      val cands = HeavyHitters.candidates(df, "item", k).toMap
      val mustHave = truth.filter { case (_, c) => c * k > n }.keySet
      assert(mustHave.subsetOf(cands.keySet),
        s"k=$k parts=$parts missing ${mustHave -- cands.keySet}")
      assert(cands.size <= k - 1, s"summary exceeded k-1: ${cands.size}")
      // MG lower-bound property: est <= true, undercount <= n/k
      cands.foreach { case (i, est) =>
        val t = truth(i)
        assert(est <= t && t - est <= n / k,
          s"k=$k parts=$parts item=$i est=$est true=$t")
      }
    }
  }

  test("exactOverThreshold equals the brute-force group-by, exactly") {
    val data = skewedItems(20000, seed = 11)
    val df = data.toDF("item").repartition(7)
    for (k <- Seq(3, 5, 10)) {
      val got = HeavyHitters.exactOverThreshold(df, "item", k)
        .select("item", "cnt").as[(String, Long)].collect().toMap
      val n = data.size.toLong
      val want = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toMap
      assert(got === want, s"k=$k")
    }
  }

  test("exactOverThreshold handles no-heavy-hitter and all-null inputs") {
    val uniform = (1 to 5000).map(i => s"u${i % 1000}").toDF("item")
    assert(HeavyHitters.exactOverThreshold(uniform, "item", 10).isEmpty)
    val nulls = Seq.fill(100)(null: String).toDF("item")
    assert(HeavyHitters.exactOverThreshold(nulls, "item", 10).isEmpty)
  }

  test("HLL distinct tier: union-merged and direct daily estimates both " +
    "within the sketch error bound of exact truth, at any partitioning") {
    val rnd = new Random(3)
    val pts = (1 to 30000).map { _ =>
      val series = s"host${rnd.nextInt(4)}"
      val hour = rnd.nextInt(72)
      val user = rnd.nextInt(500)
      (series, hour.toLong, user.toLong)
    }
    val truth = pts.groupBy(p => (p._1, p._2 / 24))
      .view.mapValues(_.map(_._3).distinct.size.toLong).toMap
    val estimates = for (parts <- Seq(1, 8)) yield {
      val df = pts.toDF("series_id", "hour_rank", "item").repartition(parts)
      val hourly = Tiers.distinctHourly(df, "series_id", "hour_rank", "item")
      val merged = Tiers.withDistinctEstimate(
        Tiers.rollupDistinct(hourly, "hourly", "daily"))
        .select(col("series_id"), col("bucket"), col("distinct_est"))
        .as[(String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val direct = Tiers.withDistinctEstimate(
        Tiers.distinctHourly(
          df.withColumn("day", floor(col("hour_rank") / 24)),
          "series_id", "day", "item"))
        .select(col("series_id"), col("bucket"), col("distinct_est"))
        .as[(String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(merged.keySet === direct.keySet)
      // the continuous-aggregate invariant: rolling up hourly sketches
      // preserves the sketch's error bound. Estimates are NOT bit-equal
      // across merge topologies (sparse-to-dense promotion depends on
      // the accumulation path — see Tiers scaladoc), so both paths are
      // pinned against exact truth at 5% (>= 3 sigma of the 1.6% dense-mode
      // error at lgK=12; deterministic input, so no flake)
      merged.foreach { case (key, est) =>
        val t = truth(key).toDouble
        assert(math.abs(est - t) <= math.max(2.0, 0.05 * t),
          s"merged est=$est truth=$t at $key")
        assert(math.abs(direct(key) - t) <= math.max(2.0, 0.05 * t),
          s"direct est=${direct(key)} truth=$t at $key")
      }
      merged
    }
    // determinism across partitionings holds to the same bound (exact
    // register state may differ only via promotion-path effects)
    estimates(0).foreach { case (key, est) =>
      assert(math.abs(est - estimates(1)(key)) <=
        math.max(2.0, 0.05 * truth(key)), s"partitioning drift at $key")
    }
  }

  test("HLL tier chain rolls hourly -> daily -> weekly by pure union") {
    val pts = (0 until 336).flatMap { hour =>
      (0 until 20).map(u => ("h", hour.toLong, (hour % 48 * 100 + u).toLong))
    }
    val df = pts.toDF("series_id", "hour_rank", "item")
    val hourly = Tiers.distinctHourly(df, "series_id", "hour_rank", "item")
    val daily = Tiers.rollupDistinct(hourly, "hourly", "daily")
    val weekly = Tiers.withDistinctEstimate(
      Tiers.rollupDistinct(daily, "daily", "weekly"))
      .select(col("bucket"), col("distinct_est")).as[(Long, Double)]
      .collect().toMap
    // each 48-hour cycle spans 48*20 = 960 distinct items; a week sees
    // all of them (168h > 48h cycle). Two union hops (hourly->daily->
    // weekly) keep the error bound: within 2% of truth.
    assert(weekly.keySet === Set(0L, 1L))
    weekly.values.foreach(v =>
      assert(math.abs(v - 960.0) <= 0.02 * 960, s"weekly est $v"))
  }
}
