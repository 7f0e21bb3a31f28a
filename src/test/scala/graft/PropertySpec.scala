package graft

import graft.kernels.MatrixKernels
import graft.rollup.Gorilla
import graft.stats.Stats
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level property tests (SURVEY.md §5.2 item 3). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val finiteD = Gen.choose(-1e6, 1e6)

  test("AUROC is within [0,1] and complement-symmetric") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(finiteD),
      Gen.nonEmptyListOf(Gen.oneOf(true, false))) { (xs, bs) =>
      val n = math.min(xs.size, bs.size)
      val score = xs.take(n).toArray
      val bool = bs.take(n).toArray
      val a = MatrixKernels.auroc(score, bool)
      a.isNaN || (a >= -1e-12 && a <= 1 + 1e-12)
    })
  }

  test("KS statistic in [0,1], p in [0,1], D invariant under monotone shift/scale") {
    val gen = for {
      x <- Gen.nonEmptyListOf(finiteD)
      y <- Gen.nonEmptyListOf(finiteD)
    } yield (x.toArray, y.toArray)
    check(Prop.forAll(gen) { case (x, y) =>
      val r = Stats.ksTest(x, y, Stats.TwoSided)
      val shifted = Stats.ksTest(x.map(_ * 2 + 5), y.map(_ * 2 + 5), Stats.TwoSided)
      r.statistic >= 0 && r.statistic <= 1 &&
        r.pValue >= 0 && r.pValue <= 1 &&
        math.abs(r.statistic - shifted.statistic) < 1e-12
    })
  }

  test("BH adjust: monotone in p, >= raw p, <= 1") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 1.0))) { ps =>
      val p = ps.toArray
      val adj = Stats.bhAdjust(p)
      val geRaw = p.indices.forall(i => adj(i) >= p(i) - 1e-12 && adj(i) <= 1 + 1e-12)
      // order preservation: smaller p never gets a larger adjusted value
      val pairs = p.indices.flatMap(i => p.indices.map(j => (i, j)))
      val mono = pairs.forall { case (i, j) =>
        p(i) <= p(j) == false || adj(i) <= adj(j) + 1e-12
      }
      geRaw && mono
    })
  }

  test("Gorilla encode/decode is the identity on arbitrary streams") {
    val pointGen = for {
      n <- Gen.choose(1, 120)
      deltas <- Gen.listOfN(n, Gen.choose(1L, 5000L))
      vals <- Gen.listOfN(n, Gen.oneOf(
        finiteD, Gen.const(0.0), Gen.const(Double.NaN),
        Gen.const(Double.PositiveInfinity)))
    } yield deltas.scanLeft(0L)(_ + _).tail.zip(vals).toArray
    check(Prop.forAll(pointGen) { pts =>
      val dec = Gorilla.decode(Gorilla.encode(pts))
      dec.length == pts.length && dec.indices.forall { i =>
        dec(i)._1 == pts(i)._1 &&
          java.lang.Double.doubleToLongBits(dec(i)._2) ==
            java.lang.Double.doubleToLongBits(pts(i)._2)
      }
    })
  }

  test("type-7 quantile: bounded by min/max, monotone in p") {
    check(Prop.forAll(Gen.nonEmptyListOf(finiteD), Gen.choose(0.0, 1.0),
      Gen.choose(0.0, 1.0)) { (xs, p1, p2) =>
      val sorted = xs.toArray.sorted
      val (lo, hi) = (math.min(p1, p2), math.max(p1, p2))
      val qlo = Stats.quantile7(sorted, lo)
      val qhi = Stats.quantile7(sorted, hi)
      qlo >= sorted.head - 1e-9 && qhi <= sorted.last + 1e-9 && qlo <= qhi + 1e-9
    })
  }

  test("pnorm is a CDF: monotone, symmetric") {
    check(Prop.forAll(Gen.choose(-8.0, 8.0), Gen.choose(-8.0, 8.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      Stats.pnorm(lo) <= Stats.pnorm(hi) + 1e-15 &&
        math.abs(Stats.pnorm(a) + Stats.pnorm(-a) - 1.0) < 1e-12
    })
  }

  test("exact KS: psmirnov path probability is a CDF in d") {
    check(Prop.forAll(Gen.choose(2, 12), Gen.choose(2, 12),
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (m, n, d1, d2) =>
      val (lo, hi) = (math.min(d1, d2), math.max(d1, d2))
      val plo = Stats.psmirnovPaths(lo, m, n, 0)
      val phi = Stats.psmirnovPaths(hi, m, n, 0)
      plo >= -1e-12 && phi <= 1 + 1e-12 && plo <= phi + 1e-9
    })
  }
}
