package graft.tools

/** Dev harness: exercise Bench.runFork under sbt's in-process classloader
  * (where java.class.path is useless and code-source discovery must work).
  * args: <cores> <pagesDir> [reps] [kernelSeries]
  */
object ForkCheck {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val ks = if (args.length > 3) args(3).toInt else 16
    graft.Bench.runFork(cores, dir, reps, ks, math.max(cores * 2, 8)) match {
      case Some((pts, psecs, steals, ksps)) =>
        println(s"FORKCHECK ok points=$pts pipeline_secs=$psecs " +
          s"steal_frac=$steals kernel_sps=$ksps")
      case None => println("FORKCHECK FAILED")
    }
  }
}
