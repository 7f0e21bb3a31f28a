package graft.tools

import graft.kernels.MatrixKernels
import org.apache.spark.sql.SparkSession

/** CPU-bound scaling witness: the ctas per-series matrix kernels
  * (distance matrix + LOF + own-site AUROC + PCA) over many series —
  * one task per series, no shuffle in the measured loop. This is the
  * anomaly-kernel half of the engine and demonstrates compute scaling
  * that the (memory-bandwidth-bound on one box) rollup half cannot.
  */
object KernelScalingProbe {

  def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"kprobe$cores")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** nSeries kernel tasks, each over an m x p matrix */
  def run(spark: SparkSession, nSeries: Int, m: Int, p: Int): Double = {
    val t0 = System.nanoTime()
    val total = spark.sparkContext
      .parallelize(0 until nSeries, math.min(nSeries, 256))
      .map { sid =>
        val rng = new java.util.SplittableRandom(sid)
        val mat = Array.fill(m, p)(rng.nextDouble() * 10)
        val sites = Array.tabulate(m)(i => s"site${i % 12}")
        val dist = MatrixKernels.distMatrix(mat)
        val lof = MatrixKernels.lof(dist)
        val oss = MatrixKernels.ownSiteSimilarity(dist, sites)
        val pca = MatrixKernels.principalComponents(mat)
        lof.count(!_.isNaN) + oss.length + pca.map(_.length).getOrElse(0)
      }
      .sum()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[kprobe] series=$nSeries m=$m p=$p out=$total sec=$sec%.1f " +
      f"series_per_sec=${nSeries / sec}%.1f")
    nSeries / sec
  }

  def main(args: Array[String]): Unit = {
    val (nSeries, m, p) = (600, 300, 100)
    val hiC = sys.env.getOrElse("PROBE_HI", "32").toInt
    val loC = sys.env.getOrElse("PROBE_LO", "8").toInt
    val hi = session(hiC)
    run(hi, 60, m, p); val rHi = run(hi, nSeries, m, p)
    hi.stop()
    val lo = session(loC)
    run(lo, 60, m, p); val rLo = run(lo, nSeries, m, p)
    lo.stop()
    println(f"[kprobe] cores $loC->$hiC efficiency=${rHi / rLo / (hiC.toDouble / loC)}%.3f")
  }
}
