package graft.tools

/** Dev utility: materialize a synthetic crawl pages table.
  * args: <nPages> <outDir> [nHosts] [partitions]
  */
object GenPages {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val dir = args(1)
    val hosts = if (args.length > 2) args(2).toInt else math.max(1000L, n / 300).toInt
    val parts = if (args.length > 3) args(3).toInt else 32
    val spark = ScalingProbe.session(16, 32)
    try graft.rollup.CrawlSynth.pages(spark, n, hosts, parts)
      .write.mode("overwrite").parquet(dir)
    finally spark.stop()
  }
}
