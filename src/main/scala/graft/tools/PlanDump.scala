package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of queries to files — the
  * plans/r06 evidence artifacts. Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * Session config mirrors graft.Bench's query phase.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args(3).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"PLAN $name ok")
      } catch { case e: Throwable =>
        println(s"PLAN $name failed: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
