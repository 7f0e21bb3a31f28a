package graft

import graft.stats.Stats
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {

  test("pnorm matches known values") {
    assert(math.abs(Stats.pnorm(0.0) - 0.5) < 1e-15)
    assert(math.abs(Stats.pnorm(1.0) - 0.8413447460685429) < 1e-12)
    assert(math.abs(Stats.pnorm(2.0) - 0.9772498680518208) < 1e-12)
    assert(math.abs(Stats.pnorm(-3.0) - 0.0013498980316300933) < 1e-12)
  }

  test("qnorm inverts pnorm") {
    for (p <- Seq(1e-9, 1e-4, 0.025, 0.3, 0.5, 0.7, 0.975, 1 - 1e-6)) {
      assert(math.abs(Stats.pnorm(Stats.qnorm(p)) - p) < 1e-11, s"p=$p")
    }
    assert(math.abs(Stats.qnorm(0.975) - 1.959963984540054) < 1e-9)
  }

  test("type-7 quantile matches R") {
    val v = Array(1.0, 2.0, 3.0, 4.0)
    assert(Stats.quantile7(v, 0.25) === 1.75)
    assert(Stats.quantile7(v, 0.5) === 2.5)
    assert(Stats.quantile7(v, 0.75) === 3.25)
    assert(Stats.quantile7(Array(5.0), 0.9) === 5.0)
  }

  test("BH adjustment matches hand-computed example") {
    val p = Array(0.01, 0.04, 0.03, 0.005)
    val adj = Stats.bhAdjust(p)
    assert(adj.zip(Array(0.02, 0.04, 0.04, 0.02)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // monotone: adjusted >= raw, <= 1
    val p2 = Array(0.9, 0.001, 0.5, 0.5, 0.02)
    val a2 = Stats.bhAdjust(p2)
    p2.indices.foreach(i => assert(a2(i) >= p2(i) - 1e-15 && a2(i) <= 1.0))
    // ties get identical adjusted values
    assert(a2(2) === a2(3))
  }

  test("exact two-sample KS matches brute-force enumeration pins") {
    val x = Array(0.1, 0.5, 0.9, 1.3, 2.0)
    val y = Array(0.2, 0.6, 1.0, 1.5, 2.5, 3.0)
    val two = Stats.ksTest(x, y, Stats.TwoSided)
    assert(math.abs(two.statistic - 1.0 / 3) < 1e-12)
    assert(math.abs(two.pValue - 0.8181818181818182) < 1e-12)
    val gt = Stats.ksTest(x, y, Stats.Greater)
    assert(math.abs(gt.pValue - 0.44805194805194803) < 1e-12)
    val lt = Stats.ksTest(x, y, Stats.Less)
    assert(math.abs(lt.statistic) < 1e-12 && math.abs(lt.pValue - 1.0) < 1e-12)
    // m=4, n=7, D=15/28 pinned via exhaustive C(11,4) enumeration
    assert(math.abs(Stats.psmirnovPaths(15.0 / 28, 4, 7, 0) - (1 - 0.3090909090909091)) < 1e-12)
  }

  test("asymptotic KS: identical well-separated samples give tiny p") {
    val x = Array.tabulate(200)(i => i.toDouble)
    val y = Array.tabulate(200)(i => i + 500.0)
    val r = Stats.ksTest(x, y, Stats.TwoSided)
    assert(r.statistic === 1.0)
    assert(r.pValue < 1e-10)
    // same distribution => high p
    val z1 = Array.tabulate(150)(i => (i * 7919 % 1000).toDouble)
    val z2 = Array.tabulate(160)(i => (i * 104729 % 1000).toDouble + 0.5)
    val r2 = Stats.ksTest(z1, z2, Stats.TwoSided)
    assert(r2.pValue > 0.01)
  }

  test("kolmogorov distribution at known quantile") {
    // 95th percentile of the Kolmogorov distribution ~ 1.358
    assert(math.abs(Stats.pkolmogorov(1.358) - 0.95) < 2e-3)
    assert(Stats.pkolmogorov(0.2) < 1e-6)
    assert(Stats.pkolmogorov(3.0) > 0.9999)
    // both branches agree with the true value K(1) = 0.7300003283226455
    assert(math.abs(Stats.pkolmogorov(0.999999) - 0.7300003283226455) < 3e-6)
    assert(math.abs(Stats.pkolmogorov(1.000001) - 0.7300003283226455) < 3e-6)
  }

  test("ks.test p-values pinned against independent exact-rational references") {
    // Reference values from tools/gen_ks_reference.py: the exact path is
    // big-integer lattice-path counting over exact rationals (correct to
    // the last double bit, implementation-independent); the asymptotic
    // paths use the public Kolmogorov series / one-sided exponential
    // bound with R ks.test path selection (exact iff m*n < 10^4 and no
    // ties — R/ctas.R:355 semantics). Same LCG sample generator on both
    // sides (Java Long overflow == python mod 2^64).
    def sample(seed: Long, n: Int, scale: Double = 1.0, shift: Double = 0.0): Array[Double] = {
      var s = seed
      Array.fill(n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        shift + scale * ((s >>> 11).toDouble / 9007199254740992.0)
      }
    }
    val ties = Array[Double](1, 2, 2, 3, 4, 5, 5)
    val ties2 = Array[Double](2, 3, 3, 4, 6, 6)
    val cases: Seq[(String, Array[Double], Array[Double], Stats.KsAlternative, Double, Double)] = Seq(
      ("x5y7 two", sample(1, 5), sample(2, 7), Stats.TwoSided,
        0.42857142857142855, 0.5454545454545454),
      ("x5y7 greater", sample(1, 5), sample(2, 7), Stats.Greater,
        0.22857142857142856, 0.6300505050505051),
      ("x5y7 less", sample(1, 5), sample(2, 7), Stats.Less,
        0.42857142857142855, 0.2765151515151515),
      ("x8y8 two", sample(3, 8), sample(4, 8, scale = 1.3), Stats.TwoSided,
        0.375, 0.6601398601398601),
      ("x8y8 greater", sample(3, 8), sample(4, 8, scale = 1.3), Stats.Greater,
        0.375, 0.3393939393939394),
      ("x8y8 less", sample(3, 8), sample(4, 8, scale = 1.3), Stats.Less,
        0.125, 0.8888888888888888),
      ("x20y30 two", sample(5, 20), sample(6, 30, shift = 0.2), Stats.TwoSided,
        0.5, 0.003356115391389147),
      ("x20y30 greater", sample(5, 20), sample(6, 30, shift = 0.2), Stats.Greater,
        0.5, 0.0016780576957157918),
      ("x20y30 less", sample(5, 20), sample(6, 30, shift = 0.2), Stats.Less,
        0.0, 1.0),
      ("x40y60 two", sample(7, 40), sample(8, 60, shift = 0.35), Stats.TwoSided,
        0.5, 6.2660190148725815e-06),
      ("x40y60 greater", sample(7, 40), sample(8, 60, shift = 0.35), Stats.Greater,
        0.5, 3.1330095074362908e-06),
      // m*n = 12000 >= 10^4 -> asymptotic even without ties
      ("x150y80 two asymp", sample(9, 150), sample(10, 80, shift = 0.15), Stats.TwoSided,
        0.2916666666666667, 2.7917704328561666e-04),
      ("x150y80 greater asymp", sample(9, 150), sample(10, 80, shift = 0.15), Stats.Greater,
        0.2916666666666667, 1.3958852164318043e-04),
      // ties force the asymptotic path even at small m*n
      ("ties two asymp", ties, ties2, Stats.TwoSided,
        0.3333333333333333, 0.865413283499468),
      ("ties greater asymp", ties, ties2, Stats.Greater,
        0.3333333333333333, 0.4877517468944826),
      ("ties less asymp", ties, ties2, Stats.Less, 0.0, 1.0))
    cases.foreach { case (tag, x, y, alt, wantD, wantP) =>
      val r = Stats.ksTest(x, y, alt)
      assert(math.abs(r.statistic - wantD) <= 1e-12, s"$tag D: ${r.statistic} want $wantD")
      val tol = math.max(1e-12, wantP * 1e-9)
      assert(math.abs(r.pValue - wantP) <= tol, s"$tag p: ${r.pValue} want $wantP")
    }
  }

  test("deterministic jitter is stable, small, and centered") {
    val vals = (1 to 10000).map(i => Stats.jitter(Stats.hash64(s"key$i")))
    assert(Stats.jitter(Stats.hash64("key1")) === vals.head) // deterministic
    val mean = vals.sum / vals.size
    assert(math.abs(mean) < 1e-6)
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (vals.size - 1))
    assert(math.abs(sd - 1e-5) < 2e-6)
  }
}
