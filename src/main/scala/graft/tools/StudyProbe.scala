package graft.tools

import graft.ctas._
import graft.queries.StudyQueries
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: run the full ctas study block (what q_ctas_mixed_effects
  * pays in the bench) with a job-level timing listener, so the ~45 s can
  * be attributed to pipeline phases instead of guessed at.
  */
object StudyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("study-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
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
          val secs = (now - st._1) / 1e9
          println(f"JOB ${je.jobId}%4d start=${(st._1 - epoch) / 1e9}%7.2f dur=${secs}%7.2f  ${st._2}")
        }
      }
    })

    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    val outs = StudyQueries.study(spark, d)
    val t1 = System.nanoTime()
    println(f"STUDY total ${(t1 - t0) / 1e9}%.2f s (features=${outs.timeseriesFeatures.count()}, pca=${outs.pcaCoordinates.count()}, scores=${outs.siteScores.count()})")

    val me = StudyQueries.all.find(_.name == "q_ctas_mixed_effects").get
    val t2 = System.nanoTime()
    val n = me.fn(spark, d).count()
    val t3 = System.nanoTime()
    println(f"ME tail ${(t3 - t2) / 1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
