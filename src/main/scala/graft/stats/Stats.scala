package graft.stats

/** Scalar statistics kernels needed by the ctas pipeline (SURVEY.md §2.1).
  *
  * All implementations are from the published algorithms (no R code is
  * used): erf/erfc from W.J. Cody's rational Chebyshev approximations
  * (CALERF, Rational Chebyshev approximation for the error function,
  * Math. Comp. 23, 1969), the normal quantile from Wichura's AS 241
  * (PPND16), quantiles are the standard "type 7" linear interpolation,
  * and the Kolmogorov asymptotic distribution is the classical alternating
  * series with the theta-function transform for small t.
  */
object Stats {

  // ---------------------------------------------------------------- erf

  private val erfA = Array(3.16112374387056560e0, 1.13864154151050156e2,
    3.77485237685302021e2, 3.20937758913846947e3, 1.85777706184603153e-1)
  private val erfB = Array(2.36012909523441209e1, 2.44024637934444173e2,
    1.28261652607737228e3, 2.84423683343917062e3)
  private val erfC = Array(5.64188496988670089e-1, 8.88314979438837594e0,
    6.61191906371416295e1, 2.98635138197400131e2, 8.81952221241769090e2,
    1.71204761263407058e3, 2.05107837782607147e3, 1.23033935479799725e3,
    2.15311535474403846e-8)
  private val erfD = Array(1.57449261107098347e1, 1.17693950891312499e2,
    5.37181101862009858e2, 1.62138957456669019e3, 3.29079923573345963e3,
    4.36261909014324716e3, 3.43936767414372164e3, 1.23033935480374942e3)
  private val erfP = Array(3.05326634961232344e-1, 3.60344899949804439e-1,
    1.25781726111229246e-1, 1.60837851487422766e-2, 6.58749161529837803e-4,
    1.63153871373020978e-2)
  private val erfQ = Array(2.56852019228982242e0, 1.87295284992346047e0,
    5.27905102951428412e-1, 6.05183413124413191e-2, 2.33520497626869185e-3)

  private val invSqrtPi = 5.6418958354775628695e-1

  /** erfc(x), double precision (~1e-15 relative). */
  def erfc(x: Double): Double = {
    val ax = math.abs(x)
    if (ax <= 0.5) {
      1.0 - erf(x)
    } else if (ax <= 4.0) {
      var xnum = erfC(8) * ax
      var xden = ax
      var i = 0
      while (i < 7) { xnum = (xnum + erfC(i)) * ax; xden = (xden + erfD(i)) * ax; i += 1 }
      val r = (xnum + erfC(7)) / (xden + erfD(7))
      val res = math.exp(-ax * ax) * r
      if (x < 0) 2.0 - res else res
    } else {
      val xsq = 1.0 / (ax * ax)
      var xnum = erfP(5) * xsq
      var xden = xsq
      var i = 0
      while (i < 4) { xnum = (xnum + erfP(i)) * xsq; xden = (xden + erfQ(i)) * xsq; i += 1 }
      var r = xsq * (xnum + erfP(4)) / (xden + erfQ(4))
      r = (invSqrtPi - r) / ax
      val res = math.exp(-ax * ax) * r
      if (x < 0) 2.0 - res else res
    }
  }

  /** erf(x), double precision. */
  def erf(x: Double): Double = {
    val ax = math.abs(x)
    if (ax <= 0.5) {
      val xsq = if (ax > 1.11e-16) x * x else 0.0
      var xnum = erfA(4) * xsq
      var xden = xsq
      var i = 0
      while (i < 3) { xnum = (xnum + erfA(i)) * xsq; xden = (xden + erfB(i)) * xsq; i += 1 }
      x * (xnum + erfA(3)) / (xden + erfB(3))
    } else {
      val v = 1.0 - erfc(ax)
      if (x < 0) -v else v
    }
  }

  /** Standard normal CDF Φ(z) (R pnorm equivalent; R/ctas.R:237). */
  def pnorm(z: Double): Double =
    if (z.isNaN) Double.NaN else 0.5 * erfc(-z / math.sqrt(2.0))

  // -------------------------------------------------------------- qnorm

  /** Inverse standard normal CDF (Wichura AS 241, PPND16; used for the
    * deterministic replacement of the reference's unseeded jitter,
    * R/ctas.R:304 — see SURVEY.md §2.3.5).
    */
  def qnorm(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"qnorm requires p in (0,1), got $p")
    val q = p - 0.5
    if (math.abs(q) <= 0.425) {
      val r = 0.180625 - q * q
      q * (((((((2.5090809287301226727e3 * r + 3.3430575583588128105e4) * r +
        6.7265770927008700853e4) * r + 4.5921953931549871457e4) * r +
        1.3731693765509461125e4) * r + 1.9715909503065514427e3) * r +
        1.3314166789178437745e2) * r + 3.3871328727963666080e0) /
        (((((((5.2264952788528545610e3 * r + 2.8729085735721942674e4) * r +
          3.9307895800092710610e4) * r + 2.1213794301586595867e4) * r +
          5.3941960214247511077e3) * r + 6.8718700749205790830e2) * r +
          4.2313330701600911252e1) * r + 1.0)
    } else {
      var r = if (q < 0) p else 1.0 - p
      r = math.sqrt(-math.log(r))
      val v =
        if (r <= 5.0) {
          val s = r - 1.6
          (((((((7.74545014278341407640e-4 * s + 2.27238449892691845833e-2) * s +
            2.41780725177450611770e-1) * s + 1.27045825245236838258e0) * s +
            3.64784832476320460504e0) * s + 5.76949722146069140550e0) * s +
            4.63033784615654529590e0) * s + 1.42343711074968357734e0) /
            (((((((1.05075007164441684324e-9 * s + 5.47593808499534494600e-4) * s +
              1.51986665636164571966e-2) * s + 1.48103976427480074590e-1) * s +
              6.89767334985100004550e-1) * s + 1.67638483018380384940e0) * s +
              2.05319162663775882187e0) * s + 1.0)
        } else {
          val s = r - 5.0
          (((((((2.01033439929228813265e-7 * s + 2.71155556874348757815e-5) * s +
            1.24266094738807843860e-3) * s + 2.65321895265761230930e-2) * s +
            2.96560571828504891230e-1) * s + 1.78482653991729133580e0) * s +
            5.46378491116411436990e0) * s + 6.65790464350110377720e0) /
            (((((((2.04426310338993978564e-15 * s + 1.42151175831644588870e-7) * s +
              1.84631831751005468180e-5) * s + 7.86869131145613259100e-4) * s +
              1.48753612908506148525e-2) * s + 1.36929880922735805310e-1) * s +
              5.99832206555887937690e-1) * s + 1.0)
        }
      if (q < 0) -v else v
    }
  }

  // ---------------------------------------------------- type-7 quantile

  /** R type-7 quantile (linear interpolation): h = (n-1)p, x[⌊h⌋] +
    * (h-⌊h⌋)(x[⌊h⌋+1] - x[⌊h⌋]). Same rule as Spark `percentile` and
    * DuckDB `quantile_cont` — used for the IQR fence (R/ctas.R:1259-1261).
    */
  def quantile7(sortedValues: Array[Double], p: Double): Double = {
    val n = sortedValues.length
    require(n > 0, "quantile of empty array")
    if (n == 1) return sortedValues(0)
    val h = (n - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, n - 1)
    sortedValues(lo) + (h - lo) * (sortedValues(hi) - sortedValues(lo))
  }

  // ------------------------------------------------- Benjamini-Hochberg

  /** p.adjust(method = "fdr") over a vector (R/ctas.R:222, 239):
    * sort p descending, running min of p * n / rank(asc), clamp to 1.
    */
  def bhAdjust(p: Array[Double]): Array[Double] = {
    val n = p.length
    if (n == 0) return p
    val idx = p.indices.sortBy(i => -p(i)) // descending by p
    val out = new Array[Double](n)
    var runMin = Double.PositiveInfinity
    var k = 0
    while (k < n) {
      val i = idx(k)
      val rankAsc = n - k // rank in ascending order
      val v = p(i) * n / rankAsc
      runMin = math.min(runMin, v)
      out(i) = math.min(1.0, runMin)
      k += 1
    }
    out
  }

  // --------------------------------------------- Kolmogorov distribution

  /** CDF of the Kolmogorov distribution P(K <= t) (asymptotic two-sided
    * two-sample KS null distribution). Alternating series for t >= 1,
    * theta-function transform for t < 1 (the same split R's stats uses
    * for numerical stability).
    */
  def pkolmogorov(t: Double): Double = {
    if (t <= 0) return 0.0
    if (t < 1.0) {
      val z = -math.Pi * math.Pi / (8.0 * t * t)
      var s = 0.0
      var k = 1
      while (k <= 20) {
        val term = math.exp(z * (2 * k - 1) * (2 * k - 1))
        s += term
        if (term < 1e-17) k = 21
        k += 1
      }
      math.sqrt(2.0 * math.Pi) / t * s
    } else {
      var s = 0.0
      var k = 1
      var sign = 1.0
      while (k <= 100) {
        val term = sign * math.exp(-2.0 * k * k * t * t)
        s += term
        if (math.abs(term) < 1e-17) k = 101
        sign = -sign
        k += 1
      }
      math.max(0.0, math.min(1.0, 1.0 - 2.0 * s))
    }
  }

  // ------------------------------------------------- two-sample KS test

  sealed trait KsAlternative
  case object TwoSided extends KsAlternative
  /** D+ = max(Fx - Fy) */
  case object Greater extends KsAlternative
  /** D- = max(Fy - Fx) */
  case object Less extends KsAlternative

  final case class KsResult(statistic: Double, pValue: Double)

  /** Two-sample Kolmogorov-Smirnov test with R ks.test semantics
    * (R/ctas.R:355): exact p when m*n < 10^4 and no ties, else asymptotic
    * (Kolmogorov series two-sided, exp(-2D²mn/(m+n)) one-sided).
    * Tie-aware D via a merged sweep over the sorted pooled sample.
    */
  def ksTest(x: Array[Double], y: Array[Double], alternative: KsAlternative): KsResult = {
    val m = x.length
    val n = y.length
    require(m > 0 && n > 0, "ks test requires non-empty samples")
    val xs = x.sorted
    val ys = y.sorted
    // merged sweep: at each distinct pooled value, diff = Fx - Fy
    var i = 0; var j = 0
    var dPlus = 0.0; var dMinus = 0.0
    var hasTies = false
    while (i < m || j < n) {
      val v =
        if (i < m && (j >= n || xs(i) <= ys(j))) xs(i)
        else ys(j)
      var ci = 0; var cj = 0
      while (i < m && xs(i) == v) { i += 1; ci += 1 }
      while (j < n && ys(j) == v) { j += 1; cj += 1 }
      if ((ci > 1) || (cj > 1) || (ci > 0 && cj > 0)) hasTies = true
      val diff = i.toDouble / m - j.toDouble / n
      if (diff > dPlus) dPlus = diff
      if (-diff > dMinus) dMinus = -diff
    }
    val d = alternative match {
      case TwoSided => math.max(dPlus, dMinus)
      case Greater  => dPlus
      case Less     => dMinus
    }
    val exactOk = m.toLong * n < 10000L && !hasTies
    val p =
      if (exactOk) {
        val side = alternative match {
          case TwoSided => 0
          case Greater  => 1
          case Less     => -1
        }
        1.0 - psmirnovPaths(d, m, n, side)
      } else {
        alternative match {
          case TwoSided =>
            val en = math.sqrt(m.toDouble * n / (m.toDouble + n))
            1.0 - pkolmogorov(en * d)
          case _ =>
            val en = m.toDouble * n / (m.toDouble + n)
            math.exp(-2.0 * en * d * d)
        }
      }
    KsResult(d, math.max(0.0, math.min(1.0, p)))
  }

  /** Exact null P(D < q) for the two-sample KS statistic with sample sizes
    * (m, n), no ties, via the classical lattice-path recursion
    * (Hodges 1958 / Kim & Jennrich): count monotone (0,0)→(m,n) paths
    * staying inside the band, with progressive normalization so the
    * result is the probability directly. side: 0 = |Fx-Fy| band
    * (two-sided), +1 = only Fx-Fy (greater), -1 = only Fy-Fx (less).
    */
  def psmirnovPaths(dStat: Double, m: Int, n: Int, side: Int): Double = {
    val md = m.toDouble
    val nd = n.toDouble
    // Round the statistic onto the achievable lattice (guards fp noise
    // in d*m*n being infinitesimally below an integer).
    val q = (0.5 + math.floor(dStat * md * nd - 1e-7)) / (md * nd)
    def out(fx: Double, fy: Double): Boolean = side match {
      case 0  => math.abs(fx - fy) > q
      case 1  => (fx - fy) > q
      case -1 => (fy - fx) > q
    }
    val u = new Array[Double](n + 1)
    var j = 0
    while (j <= n) {
      u(j) = if (out(0.0, j / nd)) 0.0 else 1.0
      j += 1
    }
    var i = 1
    while (i <= m) {
      val w = i.toDouble / (i + nd)
      u(0) = if (out(i / md, 0.0)) 0.0 else w * u(0)
      j = 1
      while (j <= n) {
        u(j) = if (out(i / md, j / nd)) 0.0 else w * u(j) + u(j - 1)
        j += 1
      }
      i += 1
    }
    u(n)
  }

  // -------------------------------------------- deterministic jitter RNG

  /** Deterministic stand-in for the reference's unseeded N(0, 1e-5) tie
    * jitter (R/ctas.R:304): a splitmix64-style avalanche of the row key
    * → uniform(0,1) → inverse-normal. Documented divergence: the
    * reference is itself not bit-reproducible here (SURVEY.md §2.3.5).
    */
  def jitter(key: Long, sd: Double = 1e-5): Double = {
    var z = key + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // map to (0,1) strictly
    val u = ((z >>> 11).toDouble + 0.5) / 9007199254740992.0 // 2^53
    qnorm(u) * sd
  }

  /** Dense matrix inverse by Gauss-Jordan with partial pivoting,
    * CLOBBERING the input (which becomes the identity); returns the
    * inverse. Used for the small (≤ a few hundred) Henderson MME solves
    * in the mixed-effects kernel — O(m³), executor-local.
    */
  def invertInPlace(a: Array[Array[Double]]): Array[Array[Double]] = {
    val m = a.length
    val inv = Array.tabulate(m, m)((i, j) => if (i == j) 1.0 else 0.0)
    var col = 0
    while (col < m) {
      var piv = col
      var r = col + 1
      while (r < m) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val ti = inv(piv); inv(piv) = inv(col); inv(col) = ti
      }
      val d = a(col)(col)
      require(math.abs(d) > 1e-300, s"singular matrix at pivot $col")
      var j = 0
      while (j < m) { a(col)(j) /= d; inv(col)(j) /= d; j += 1 }
      r = 0
      while (r < m) {
        if (r != col) {
          val f = a(r)(col)
          if (f != 0.0) {
            var k = 0
            while (k < m) { a(r)(k) -= f * a(col)(k); inv(r)(k) -= f * inv(col)(k); k += 1 }
          }
        }
        r += 1
      }
      col += 1
    }
    inv
  }

  /** Stable 64-bit hash of a string (FNV-1a), for jitter keys. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
