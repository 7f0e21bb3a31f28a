package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: run named bench queries (PROBE_QUERIES=a,b,c, PROBE_REPS=n)
  * under the bench session config with a job-level timing listener, so a
  * query's seconds can be attributed to its jobs instead of guessed at.
  * Measurement-only tool; the driver-facing contract remains graft.Bench.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = sys.env.getOrElse("PROBE_QUERIES", "q_tier_retention").split(",").toSeq
    val reps = sys.env.getOrElse("PROBE_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("query-probe")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val epoch = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site =
          if (js.properties == null) "?"
          else Option(js.properties.getProperty("callSite.short"))
            .orElse(Option(js.properties.getProperty("spark.job.description")))
            .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = starts.get(je.jobId)
        if (st != null) {
          val now = System.nanoTime()
          println(f"JOB ${je.jobId}%4d start=${(st._1 - epoch) / 1e9}%7.2f " +
            f"dur=${(now - st._1) / 1e9}%7.2f  ${st._2}")
        }
      }
    })

    try {
      graft.util.T.lineitem(spark, sfDir)
        .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
        .count().count()
    } catch { case _: Throwable => () }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        spark.sparkContext.setJobDescription(s"$name#$rep")
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"QUERY $name rep$rep ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
      }
    }
    spark.stop()
  }
}
