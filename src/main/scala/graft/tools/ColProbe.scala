package graft.tools

import graft.rollup._
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ColProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = spark.read.parquet("/tmp/probe_pages")
    def t(l: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      pages.select(c.as("x")).agg(count(col("x"))).collect()
      println(f"[col] $l ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    t("baseline length(text)")(length(col("text")))
    t("extract")(length(TextExtract.extract(col("html"))))
    t("tokenCount(text)")(TextOps.tokenCount(col("text")))
    t("quality(text)")(TextOps.qualityScore(col("text")))
    t("simhash(text)")(graft.dedup.Dedup.simhash64(col("text"), 2))
    t("langid(text)")(TextOps.langId(col("text")))
    val t0 = System.nanoTime()
    val n = SeriesDerive.hostSeriesRich(pages).agg(count(lit(1))).collect()(0).getLong(0)
    println(f"[col] hostSeriesRich rows=$n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val t1 = System.nanoTime()
    SeriesDerive.hostSeriesRich(pages).explain("formatted")
    println(f"[col] explain done ${(System.nanoTime() - t1) / 1e9}%.1fs")
    spark.stop()
  }
}
