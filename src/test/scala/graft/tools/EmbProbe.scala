package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe for the dim=768 embedding ops (the Bench embedding768
  * section in isolation). Test/runMain graft.tools.EmbProbe [nVec] [cores]
  */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val nVec = if (args.nonEmpty) args(0).toLong else 20000L
    val cores = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dim = 768
    val corpus = spark.range(0, nVec, 1, 32).map { id =>
      val cRng = new java.util.SplittableRandom(1000L + id % 64)
      val center = Array.fill(dim)(cRng.nextGaussian())
      val rng = new java.util.SplittableRandom(id)
      (id, center.map(x => x + 0.15 * rng.nextGaussian()))
    }.toDF("id", "vec").persist()
    corpus.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val planted = corpus.filter($"id" < 100)
      .select(($"id" + 1000000L).as("id"),
        transform($"vec", x => x * lit(1.0001)).as("vec"))
    val all = corpus.unionByName(planted)
    t("bucket-histogram") {
      val sig = graft.ann.Ann.hyperplaneSignature(col("vec"), 8, dim)
      all.select(sig.as("sig")).groupBy("sig").count()
        .agg(max("count"), count(lit(1))).collect().mkString
    }
    for (i <- 1 to 2)
      t(s"embdedup-$i") {
        graft.dedup.Dedup.embeddingNearDuplicates(all, "id", "vec",
          threshold = 0.99, planes = 8, dim = dim).count()
      }
    spark.stop()
  }
}
