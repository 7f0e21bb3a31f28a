package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4): replicates the
  * frozen Bench's session config, warmup and per-query timing loop —
  * WITHOUT the multi-minute scaling forks — so per-query optimization can
  * be iterated quickly. Optionally times the embedding768 block too
  * (GRAFT_EXTRA_EMB=1) and restricts to a comma-separated query subset
  * (GRAFT_EXTRA_ONLY=q_a,q_b). Timing methodology is identical to Bench
  * (same session settings, same alphabetical order, same `.count()`
  * action); numbers from this main are cited in OPTIMIZATION_r06.md but
  * the driver-facing contract remains graft.Bench.
  */
object BenchExtra {

  private def session(cores: Int, shuffleParts: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = sys.env.get("GRAFT_EXTRA_ONLY").map(_.split(",").toSet)
    val spark = session(cpus, math.max(cpus, 16))
    try {
      graft.util.T.lineitem(spark, sfDir)
        .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
        .count().count()
    } catch { case _: Throwable => () }

    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "1").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      var secs = 0.0
      var status = "ok"
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        status =
          try { fn(spark, sfDir).count(); "ok" }
          catch { case e: Throwable =>
            s"error:${e.getClass.getSimpleName}:${Option(e.getMessage).getOrElse("").take(120)}" }
        secs = (System.nanoTime() - t0) / 1e9
        if (reps > 1) println(f"EXTRA_REP $name%-28s rep$rep $secs%8.3f  $status")
      }
      println(f"EXTRA $name%-28s $secs%8.3f  $status")
      (name, secs, status)
    }
    println(f"EXTRA_TOTAL ${results.map(_._2).sum}%.3f over ${results.length} queries")
    results.filter(_._3 != "ok").foreach { case (n, _, st) => println(s"EXTRA_FAILED $n $st") }

    if (sys.env.get("GRAFT_EXTRA_EMB").contains("1")) {
      import spark.implicits._
      val dim = 768
      val nVec = 20000L
      val nQ = 50L
      val corpus = spark.range(0, nVec, 1, 32).map { id =>
        val cRng = new java.util.SplittableRandom(1000L + id % 64)
        val center = Array.fill(dim)(cRng.nextGaussian())
        val rng = new java.util.SplittableRandom(id)
        (id, center.map(x => x + 0.15 * rng.nextGaussian()))
      }.toDF("id", "vec").persist()
      corpus.count()
      val queries = corpus.filter(org.apache.spark.sql.functions.col("id") < nQ)
      def timed(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"EXTRA_EMB $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.3f  rows=$n")
      }
      var cents: IndexedSeq[Double] = null
      timed("ivf_build") {
        cents = graft.ann.Ann.kmeansCentroids(corpus, 256, dim, iters = 3, sampleN = 2048)
        cents.length.toLong
      }
      timed("ivf_topk") {
        graft.ann.Ann.ivfTopK(queries, corpus, 10, cents, dim, nprobe = 8).count()
      }
      timed("lsh_topk") {
        graft.ann.Ann.lshTopK(queries, corpus, 10, planes = 10, dim = dim, tables = 4).count()
      }
      val planted = corpus.filter($"id" < 100)
        .select(($"id" + 1000000L).as("id"),
          org.apache.spark.sql.functions.transform($"vec",
            x => x * org.apache.spark.sql.functions.lit(1.0001)).as("vec"))
      timed("embdedup") {
        graft.dedup.Dedup.embeddingNearDuplicates(corpus.unionByName(planted),
          "id", "vec", threshold = 0.99, planes = 8, dim = dim).count()
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
