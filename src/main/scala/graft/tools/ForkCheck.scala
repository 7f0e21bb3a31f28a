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
      case Some(fr) =>
        println(s"FORKCHECK ok points=${fr.points} pipeline_secs=${fr.pipelineSecs} " +
          s"steal_frac=${fr.stealFrac} kernel_sps=${fr.kernelSps} " +
          s"control_gops=${fr.controlGops} stages=${fr.stages}")
      case None => println("FORKCHECK FAILED")
    }
  }
}
