package graft

import graft.kernels.MatrixKernels
import org.scalatest.funsuite.AnyFunSuite

class MatrixKernelsSpec extends AnyFunSuite {

  test("distMatrix: euclidean with R NA-scaling semantics") {
    val m = Array(
      Array(0.0, 0.0, 0.0),
      Array(3.0, 4.0, 0.0),
      Array(1.0, Double.NaN, 1.0))
    val d = MatrixKernels.distMatrix(m)
    assert(math.abs(d(0)(1) - 5.0) < 1e-12)
    // rows 0 and 2 share dims {0,2}: sum=2, scaled by 3/2 => sqrt(3)
    assert(math.abs(d(0)(2) - math.sqrt(3.0)) < 1e-12)
    // all-NA pair
    val m2 = Array(Array(1.0, Double.NaN), Array(Double.NaN, 2.0))
    assert(MatrixKernels.distMatrix(m2)(0)(1).isNaN)
  }

  test("auroc matches R's rank formula incl. average ties") {
    assert(MatrixKernels.auroc(Array(1.0, 2.0, 3.0, 4.0),
      Array(false, false, true, true)) === 0.0)
    assert(MatrixKernels.auroc(Array(4.0, 3.0, 2.0, 1.0),
      Array(false, false, true, true)) === 1.0)
    assert(math.abs(MatrixKernels.auroc(Array(1.0, 1.0, 2.0),
      Array(false, true, false)) - 0.75) < 1e-12)
  }

  test("jacobi eigen of [[2,1],[1,2]] gives 3 and 1") {
    val (vals, vecs) = MatrixKernels.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-10 && math.abs(sorted(1) - 3.0) < 1e-10)
    // eigenvector for lambda=3 is (1,1)/sqrt(2) up to sign
    val i3 = vals.indexWhere(v => math.abs(v - 3.0) < 1e-8)
    assert(math.abs(math.abs(vecs(0)(i3)) - math.abs(vecs(1)(i3))) < 1e-10)
  }

  test("principalComponents: identity cases and variance ordering") {
    // 1 informative column
    val one = Array(Array(1.0, 7.0), Array(2.0, 7.0), Array(3.0, 7.0))
    val p1 = MatrixKernels.principalComponents(one).get
    assert(p1.map(_._1).toSeq === Seq(1.0, 2.0, 3.0))
    assert(p1.forall(_._2 == 0.0))
    // 2 columns pass through unchanged
    val two = Array(Array(1.0, 5.0), Array(2.0, 6.0), Array(3.0, 9.0))
    val p2 = MatrixKernels.principalComponents(two).get
    assert(p2.toSeq === Seq((1.0, 5.0), (2.0, 6.0), (3.0, 9.0)))
    // >2 columns: scores centered, var(pc1) >= var(pc2)
    val m = Array(
      Array(1.0, 2.0, 3.0, 4.0),
      Array(2.0, 4.0, 5.9, 8.1),
      Array(0.5, 1.2, 2.8, 4.2),
      Array(3.0, 5.5, 9.1, 12.0))
    val p = MatrixKernels.principalComponents(m).get
    def variance(v: Seq[Double]) = {
      val mu = v.sum / v.size
      v.map(x => (x - mu) * (x - mu)).sum / (v.size - 1)
    }
    val v1 = variance(p.map(_._1).toSeq)
    val v2 = variance(p.map(_._2).toSeq)
    assert(v1 >= v2)
    assert(math.abs(p.map(_._1).sum) < 1e-9) // centered scores
    // total variance preserved bound: pc1 captures most
    assert(v1 > 0)
  }

  test("principalComponents dual (wide) path: rank-2 data fully captured") {
    // rank-2 wide matrix (p=12 > m=5): pc1+pc2 capture ALL variance
    val rng = new java.util.SplittableRandom(9)
    val f1 = Array.fill(12)(rng.nextDouble())
    val f2 = Array.fill(12)(rng.nextDouble())
    val m = Array.tabulate(5, 12)((i, j) => (i + 1) * f1(j) + (i * i - 2) * f2(j))
    val p = MatrixKernels.principalComponents(m).get
    def variance(v: Seq[Double]) = {
      val mu = v.sum / v.size
      v.map(x => (x - mu) * (x - mu)).sum / (v.size - 1)
    }
    val scoreVar = variance(p.map(_._1).toSeq) + variance(p.map(_._2).toSeq)
    val totalVar = (0 until 12).map(j => variance(m.map(_(j)).toSeq)).sum
    assert(math.abs(scoreVar - totalVar) < 1e-8 * totalVar,
      s"rank-2 data: scores should capture all variance ($scoreVar vs $totalVar)")
    assert(variance(p.map(_._1).toSeq) >= variance(p.map(_._2).toSeq))
  }

  test("principalComponents imputes NaN with row means") {
    val m = Array(Array(1.0, Double.NaN, 3.0), Array(4.0, 5.0, 6.0), Array(7.0, 8.0, 100.0))
    val p = MatrixKernels.principalComponents(m)
    assert(p.isDefined)
    assert(p.get.forall { case (a, b) => !a.isNaN && !b.isNaN })
  }

  test("lof: clear outlier scores higher; uniform points near 1") {
    val pts = (Array.tabulate(12)(i => Array(i.toDouble, 0.0)) :+ Array(100.0, 0.0))
    val d = MatrixKernels.distMatrix(pts)
    val l = MatrixKernels.lof(d)
    assert(l.last > 2.0, s"outlier lof=${l.last}")
    assert(l.dropRight(1).forall(v => v < 2.0))
    // NA dist => all NaN
    val mNa = Array(Array(1.0, Double.NaN), Array(Double.NaN, 2.0), Array(1.0, 2.0))
    val lNa = MatrixKernels.lof(MatrixKernels.distMatrix(mNa))
    assert(lNa.forall(_.isNaN))
  }

  test("ownSiteSimilarity: tight same-site cluster scores high") {
    // site A: 3 close subjects; site B: 3 far-apart subjects
    val m = Array(
      Array(0.0), Array(0.1), Array(0.2), // site A, clustered
      Array(10.0), Array(50.0), Array(90.0)) // site B, spread
    val sites = Array("A", "A", "A", "B", "B", "B")
    val d = MatrixKernels.distMatrix(m)
    val scores = MatrixKernels.ownSiteSimilarity(d, sites).toMap
    assert(scores.size === 6)
    // subjects at A are much closer to each other than to B
    assert(scores(0) > 0.9 && scores(1) > 0.9 && scores(2) > 0.9)
  }
}
