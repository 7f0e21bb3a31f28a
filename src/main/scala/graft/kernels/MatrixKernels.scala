package graft.kernels

import graft.stats.Stats

/** Pure (executor-local) per-series matrix kernels. Each series' wide
  * matrix (rows = subjects, cols = observed timepoints in rank order) is
  * bounded by construction, so these run inside one task per series via
  * typed groupByKey/mapGroups (SURVEY.md §3.2 — the distance matrix never
  * crosses a partition boundary). Missing values are NaN.
  */
object MatrixKernels {

  /** Pairwise Euclidean distance with R `dist` missing-value semantics:
    * only coordinates present in both rows contribute, and the sum is
    * scaled up by p/np (total dims / used dims); all-missing pairs give
    * NaN. (Semantics per R stats::dist docs; used by R/ctas.R:604.)
    */
  def distMatrix(m: Array[Array[Double]]): Array[Array[Double]] = {
    val nRows = m.length
    val p = if (nRows == 0) 0 else m(0).length
    val d = Array.ofDim[Double](nRows, nRows)
    // rows with no NaN take a branch-free inner loop (same terms, same
    // accumulation order — bit-identical, just faster on the common case)
    val clean = new Array[Boolean](nRows)
    var r = 0
    while (r < nRows) {
      var k = 0
      var ok = true
      while (k < p) { if (m(r)(k).isNaN) { ok = false; k = p } else k += 1 }
      clean(r) = ok
      r += 1
    }
    var i = 0
    while (i < nRows) {
      val mi = m(i)
      var j = i + 1
      while (j < nRows) {
        val mj = m(j)
        var dij = 0.0
        if (clean(i) && clean(j)) {
          var sum = 0.0
          var k = 0
          while (k < p) {
            val diff = mi(k) - mj(k)
            sum += diff * diff
            k += 1
          }
          // same final expression as the general path with np == p:
          // sum*p/p is not always bit-equal to sum, so keep the division
          dij = math.sqrt(sum * p / p)
        } else {
          var sum = 0.0
          var np = 0
          var k = 0
          while (k < p) {
            val a = mi(k); val b = mj(k)
            if (!a.isNaN && !b.isNaN) {
              val diff = a - b
              sum += diff * diff
              np += 1
            }
            k += 1
          }
          dij = if (np == 0) Double.NaN else math.sqrt(sum * p / np)
        }
        d(i)(j) = dij
        d(j)(i) = dij
        j += 1
      }
      i += 1
    }
    d
  }

  /** Local Outlier Factor (Breunig et al. 2000) over a precomputed
    * distance matrix, k-distance neighborhoods INCLUDING ties.
    * minPts follows R/ctas.R:541-546: k = max(1, min(10, floor(n/3)));
    * neighborhood count used is k (minPts = k+1 including self in the
    * reference's convention). Non-finite scores are the caller's problem
    * (ctas maps them to 1, R/ctas.R:549). Any NaN distance => all-NaN
    * output (R/ctas.R:530-538).
    */
  def lof(dist: Array[Array[Double]]): Array[Double] = {
    val n = dist.length
    val out = Array.fill(n)(Double.NaN)
    if (n == 0) return out
    var anyNa = false
    var i = 0
    while (i < n && !anyNa) {
      var j = 0
      while (j < n && !anyNa) {
        if (i != j && dist(i)(j).isNaN) anyNa = true
        j += 1
      }
      i += 1
    }
    if (anyNa) return out

    var k = math.min(10, n / 3)
    if (k == 0) k = 1

    // k-distance and neighborhoods (with ties)
    val kDist = new Array[Double](n)
    val neigh = new Array[Array[Int]](n)
    i = 0
    while (i < n) {
      val ds = new Array[Double](n - 1)
      var idx = 0
      var j = 0
      while (j < n) {
        if (j != i) { ds(idx) = dist(i)(j); idx += 1 }
        j += 1
      }
      java.util.Arrays.sort(ds) // primitive in-place (no NaN here; gated above)
      val kd = ds(math.min(k, n - 1) - 1)
      kDist(i) = kd
      val nb = scala.collection.mutable.ArrayBuffer.empty[Int]
      j = 0
      while (j < n) {
        if (j != i && dist(i)(j) <= kd) nb += j
        j += 1
      }
      neigh(i) = nb.toArray
      i += 1
    }

    // local reachability density
    val lrd = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = 0.0
      val nb = neigh(i)
      var t = 0
      while (t < nb.length) {
        val o = nb(t)
        s += math.max(kDist(o), dist(i)(o))
        t += 1
      }
      lrd(i) = if (s == 0.0) Double.PositiveInfinity else nb.length / s
      i += 1
    }

    i = 0
    while (i < n) {
      val nb = neigh(i)
      var s = 0.0
      var t = 0
      while (t < nb.length) { s += lrd(nb(t)); t += 1 }
      out(i) = (s / nb.length) / lrd(i) // inf/inf => NaN, mapped to 1 upstream
      i += 1
    }
    out
  }

  /** Mann-Whitney AUROC (R/ctas.R:570-575): ranks of -score with average
    * ties; U = Σ rank[!bool] - n1(n1+1)/2; returns 1 - U/(n1·n2).
    * NaN scores rank last (R rank na.last=TRUE), preserving input order.
    */
  def auroc(score: Array[Double], bool: Array[Boolean]): Double = {
    val n = score.length
    val n1 = bool.count(!_)
    val n2 = n - n1
    if (n1 == 0 || n2 == 0) return Double.NaN
    // ranks of -score ascending = ranks of score descending; NaNs rank
    // last in input order (R rank na.last=TRUE). Was a boxed
    // indices.sortBy with tuple keys — the hot loop of own-site
    // similarity (n AUROCs of n-1 values per series); now a primitive
    // dual-array quicksort over the non-NaN entries with NaN indices
    // appended in input order. Ties get averaged ranks, so tie order is
    // irrelevant; output is bit-identical to the boxed version.
    val keys = new Array[Double](n) // -score, non-NaN only
    val order = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!score(i).isNaN) { keys(m) = -score(i); order(m) = i; m += 1 }
      i += 1
    }
    sortPairs(keys, order, 0, m - 1)
    var nanPos = m
    i = 0
    while (i < n) {
      if (score(i).isNaN) { order(nanPos) = i; nanPos += 1 }
      i += 1
    }
    val ranks = new Array[Double](n)
    i = 0
    while (i < n) {
      var j = i
      // average ranks over ties (NaN never ties: consecutive ranks)
      if (i < m) {
        while (j + 1 < m && score(order(j + 1)) == score(order(i))) j += 1
      }
      val avg = (i + j + 2) / 2.0 // 1-based average rank
      var t = i
      while (t <= j) { ranks(order(t)) = avg; t += 1 }
      i = j + 1
    }
    var u = 0.0
    i = 0
    while (i < n) {
      if (!bool(i)) u += ranks(i)
      i += 1
    }
    u -= n1.toDouble * (n1 + 1) / 2.0
    1.0 - u / n1.toDouble / n2.toDouble
  }

  /** median-of-three quicksort on a primitive key array with a companion
    * index array (no boxing). Equal keys keep arbitrary order — callers
    * must be tie-order-invariant (auroc averages tied ranks).
    */
  private def sortPairs(k: Array[Double], v: Array[Int], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      if (hi - lo < 16) { // insertion sort for small ranges
        var i = lo + 1
        while (i <= hi) {
          val kk = k(i); val vv = v(i)
          var j = i - 1
          while (j >= lo && k(j) > kk) { k(j + 1) = k(j); v(j + 1) = v(j); j -= 1 }
          k(j + 1) = kk; v(j + 1) = vv
          i += 1
        }
        return
      }
      val mid = lo + (hi - lo) / 2
      // median-of-three pivot
      val pa = k(lo); val pb = k(mid); val pc = k(hi)
      val pivot =
        if (pa < pb) { if (pb < pc) pb else if (pa < pc) pc else pa }
        else { if (pa < pc) pa else if (pb < pc) pc else pb }
      var i = lo
      var j = hi
      while (i <= j) {
        while (k(i) < pivot) i += 1
        while (k(j) > pivot) j -= 1
        if (i <= j) {
          val tk = k(i); k(i) = k(j); k(j) = tk
          val tv = v(i); v(i) = v(j); v(j) = tv
          i += 1; j -= 1
        }
      }
      // recurse into the smaller half, loop on the larger
      if (j - lo < hi - i) { sortPairs(k, v, lo, j); lo = i }
      else { sortPairs(k, v, i, hi); hi = j }
    }
  }

  /** Own-site similarity score (R/ctas.R:432-516): for each subject at a
    * site with >1 subject in the series, AUROC of its distances to all
    * other subjects vs the same-site indicator (self excluded). Subjects
    * at singleton sites get no score (the reference's -1 sentinel is
    * filtered at R/ctas.R:510-512 — we just omit them).
    * Returns (subjectIndex, score) pairs.
    */
  def ownSiteSimilarity(
      dist: Array[Array[Double]],
      sites: Array[String]): Seq[(Int, Double)] = {
    val n = dist.length
    val bySite = sites.zipWithIndex.groupBy(_._1)
    val result = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    for ((_, members) <- bySite if members.length > 1; (_, i) <- members) {
      val score = new Array[Double](n - 1)
      val bool = new Array[Boolean](n - 1)
      var idx = 0
      var j = 0
      while (j < n) {
        if (j != i) {
          score(idx) = dist(i)(j)
          bool(idx) = sites(j) == sites(i)
          idx += 1
        }
        j += 1
      }
      result += ((i, auroc(score, bool)))
    }
    result.toSeq
  }

  /** First two principal components (R/ctas.R:692-750):
    * 1. impute NaN with row means;
    * 2. drop zero-variance columns;
    * 3. 0 cols => empty; 1 col => (value, 0); 2 cols => identity;
    *    >2 => column-center + eigen-decomposition of the p×p covariance
    *    (Jacobi), scores on the top-2 eigenvectors. Sign is
    *    implementation-defined (as with prcomp/SVD) — comparisons must be
    *    sign-invariant.
    * Returns one (pc1, pc2) row per input row, or None if no columns
    * survive.
    */
  def principalComponents(mIn: Array[Array[Double]]): Option[Array[(Double, Double)]] = {
    val nRows = mIn.length
    if (nRows == 0) return None
    val p0 = mIn(0).length
    // row-mean imputation
    val m = Array.ofDim[Double](nRows, p0)
    var i = 0
    while (i < nRows) {
      var s = 0.0; var c = 0
      var k = 0
      while (k < p0) {
        val v = mIn(i)(k)
        if (!v.isNaN) { s += v; c += 1 }
        k += 1
      }
      val mean = if (c > 0) s / c else Double.NaN
      k = 0
      while (k < p0) {
        val v = mIn(i)(k)
        m(i)(k) = if (v.isNaN) mean else v
        k += 1
      }
      i += 1
    }
    // drop zero-variance columns (sample variance, as R var)
    val keep = (0 until p0).filter { k =>
      if (nRows < 2) true
      else {
        var s = 0.0
        var i2 = 0
        while (i2 < nRows) { s += m(i2)(k); i2 += 1 }
        val mean = s / nRows
        var ss = 0.0
        i2 = 0
        while (i2 < nRows) { val d = m(i2)(k) - mean; ss += d * d; i2 += 1 }
        ss / (nRows - 1) != 0.0
      }
    }.toArray
    val p = keep.length
    if (p == 0) return None
    if (p == 1) {
      return Some(Array.tabulate(nRows)(r => (m(r)(keep(0)), 0.0)))
    }
    if (p == 2) {
      return Some(Array.tabulate(nRows)(r => (m(r)(keep(0)), m(r)(keep(1)))))
    }
    // center columns
    val x = Array.ofDim[Double](nRows, p)
    var k = 0
    while (k < p) {
      var s = 0.0
      var r = 0
      while (r < nRows) { s += m(r)(keep(k)); r += 1 }
      val mean = s / nRows
      r = 0
      while (r < nRows) { x(r)(k) = m(r)(keep(k)) - mean; r += 1 }
      k += 1
    }
    if (p <= nRows) {
      // primal: eigen of the p×p covariance, scores = Xc · V
      val cov = Array.ofDim[Double](p, p)
      var a = 0
      while (a < p) {
        var b = a
        while (b < p) {
          var s = 0.0
          var r = 0
          while (r < nRows) { s += x(r)(a) * x(r)(b); r += 1 }
          val v = s / math.max(1, nRows - 1)
          cov(a)(b) = v; cov(b)(a) = v
          b += 1
        }
        a += 1
      }
      val (eigVals, eigVecs) = jacobiEigen(cov)
      val order = eigVals.indices.sortBy(i2 => -eigVals(i2))
      val v1 = order(0); val v2 = order(1)
      Some(Array.tabulate(nRows) { r =>
        var s1 = 0.0; var s2 = 0.0
        var k2 = 0
        while (k2 < p) {
          s1 += x(r)(k2) * eigVecs(k2)(v1)
          s2 += x(r)(k2) * eigVecs(k2)(v2)
          k2 += 1
        }
        (s1, s2)
      })
    } else {
      // dual (Gram) path for wide matrices (p >> m, e.g. long crawl
      // series): X = UΣVᵀ ⇒ XXᵀ = UΣ²Uᵀ, scores = UΣ = u_k·√λ_k —
      // O(p·m²) instead of O(p³), same scores up to sign.
      val g = Array.ofDim[Double](nRows, nRows)
      var a = 0
      while (a < nRows) {
        var b = a
        while (b < nRows) {
          var s = 0.0
          var k2 = 0
          while (k2 < p) { s += x(a)(k2) * x(b)(k2); k2 += 1 }
          g(a)(b) = s; g(b)(a) = s
          b += 1
        }
        a += 1
      }
      val (eigVals, eigVecs) = jacobiEigen(g)
      val order = eigVals.indices.sortBy(i2 => -eigVals(i2))
      val v1 = order(0)
      val v2 = if (order.length > 1) order(1) else order(0)
      val s1 = math.sqrt(math.max(0.0, eigVals(v1)))
      val s2 = if (order.length > 1) math.sqrt(math.max(0.0, eigVals(v2))) else 0.0
      Some(Array.tabulate(nRows) { r =>
        (eigVecs(r)(v1) * s1, if (order.length > 1) eigVecs(r)(v2) * s2 else 0.0)
      })
    }
  }

  /** Cyclic Jacobi eigenvalue algorithm for a symmetric matrix.
    * Returns (eigenvalues, eigenvectors as columns). Dimensions here are
    * #timepoints per series (small), so O(p^3) sweeps are fine.
    */
  def jacobiEigen(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = Array.tabulate(n, n)((i, j) => aIn(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100) {
      var off = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      if (off < 1e-22) sweep = 100
      else {
        i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            if (math.abs(a(i)(j)) > 1e-300) {
              val theta = (a(j)(j) - a(i)(i)) / (2.0 * a(i)(j))
              // sign(0) must be +1 here or equal-diagonal pairs never rotate
              val t = (if (theta >= 0) 1.0 else -1.0) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              val c = 1.0 / math.sqrt(t * t + 1.0)
              val s = t * c
              var k = 0
              while (k < n) {
                val aik = a(i)(k); val ajk = a(j)(k)
                a(i)(k) = c * aik - s * ajk
                a(j)(k) = s * aik + c * ajk
                k += 1
              }
              k = 0
              while (k < n) {
                val aki = a(k)(i); val akj = a(k)(j)
                a(k)(i) = c * aki - s * akj
                a(k)(j) = s * aki + c * akj
                val vki = v(k)(i); val vkj = v(k)(j)
                v(k)(i) = c * vki - s * vkj
                v(k)(j) = s * vki + c * vkj
                k += 1
              }
            }
            j += 1
          }
          i += 1
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
