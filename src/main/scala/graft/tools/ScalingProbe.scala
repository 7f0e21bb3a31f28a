package graft.tools

import graft.rollup._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N-vs-4N scaling measurement for the end-to-end rollup job
  * (BASELINE.md evidence). PROBE_LO / PROBE_HI select core counts;
  * PROBE_PAGES the input size; PROBE_LOCALDIR the shuffle dir.
  */
object ScalingProbe {

  def session(cores: Int, shuffleParts: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe$cores-$shuffleParts")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.local.dir", sys.env.getOrElse("PROBE_LOCALDIR",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-local"
        else "/tmp"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** the measured job: scan -> extract+text-metrics derive -> gap-fill
    * the continuous metrics -> hourly/daily/weekly tiers -> anomaly flags
    */
  def pipeline(spark: SparkSession, dir: String): Long = {
    val pages = spark.read.parquet(dir)
    // single-pass derive -> selective gap-fill -> hourly: the derived
    // series flow straight into the gap-fill window's exchange. Gap-fill
    // applies only to continuous metrics (LOCF on count-like metrics is
    // semantically wrong: a missing hour means zero pages) via the
    // fillWhen flag of the fused densify+LOCF — the former filter-split
    // + union shape forced a full persist of the derive output plus two
    // cache scans; this shape needs neither (the hourly agg reuses the
    // window's series_id partitioning, so it is still one shuffle total)
    val series = SeriesDerive.hostSeriesRich(pages)
    val isContinuous =
      col("series_id").startsWith("text_length") ||
        col("series_id").startsWith("quality") ||
        col("series_id").startsWith("lang_match")
    val dense = GapFill.densifyLocf(
      series.withColumn("bucket", col("hour_rank").cast("long")),
      Seq("series_id"), "bucket", "value", "v", isContinuous)
      .select(col("series_id"), col("bucket").as("hour_rank"), col("v").as("value"))
    val hourly = Tiers.hourly(dense, "series_id", "hour_rank", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val daily = Tiers.rollup(hourly, "hourly", "daily")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3 actions, not one per tier: per-action plan/schedule overhead is
    // constant-vs-input, so extra actions directly poison the N-vs-4N
    // scaling signal at the hi level (weekly+flags share one job; both
    // read the materialized daily cache)
    val one = lit(1L).as("one")
    val pts = hourly.count() + daily.count() +
      Tiers.rollup(daily, "daily", "weekly").select(one)
        .unionAll(Tiers.anomalyFlags(daily).select(one)).count()
    hourly.unpersist(); daily.unpersist()
    pts
  }

  /** The same job with per-stage wall-clock attribution (VERDICT r02
    * "Next round" #1: which stage stops scaling past 8 cores?). Four
    * actions force the stage boundaries on persisted intermediates:
    * derive (scan+extract+metrics+persist), hourly (gap-fill+first
    * shuffle), daily (re-agg), tail (weekly+flags). The 4-action shape
    * costs one action more than [[pipeline]] — stage mode is for the
    * scaling pairs, the headline keeps the 3-action plan.
    */
  def pipelineStaged(spark: SparkSession, dir: String)
      : (Long, Seq[(String, Double)]) = {
    val stages = collection.mutable.ArrayBuffer.empty[(String, Double)]
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      stages += label -> (System.nanoTime() - t0) / 1e9
      r
    }
    val pages = spark.read.parquet(dir)
    // stage mode persists the derive output purely so "derive" can be
    // timed as its own action; the headline [[pipeline]] flows it
    // straight into the gap-fill window without materializing
    val series = SeriesDerive.hostSeriesRich(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var pts = 0L
    t("derive")(series.count())
    val isContinuous =
      col("series_id").startsWith("text_length") ||
        col("series_id").startsWith("quality") ||
        col("series_id").startsWith("lang_match")
    // fused densify+LOCF, selective on the continuous metrics: one
    // window pass, no dense-grid join, no filter-split + union
    val dense = GapFill.densifyLocf(
      series.withColumn("bucket", col("hour_rank").cast("long")),
      Seq("series_id"), "bucket", "value", "v", isContinuous)
      .select(col("series_id"), col("bucket").as("hour_rank"), col("v").as("value"))
    val hourly = Tiers.hourly(dense, "series_id", "hour_rank", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts += t("hourly")(hourly.count())
    val daily = Tiers.rollup(hourly, "hourly", "daily")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts += t("daily")(daily.count())
    val one = lit(1L).as("one")
    pts += t("tail")(
      Tiers.rollup(daily, "daily", "weekly").select(one)
        .unionAll(Tiers.anomalyFlags(daily).select(one)).count())
    series.unpersist(); hourly.unpersist(); daily.unpersist()
    (pts, stages.toSeq)
  }

  /** Fixed-work pure-CPU control: `cores` tasks of identical arithmetic,
    * one wave — ops/sec measures the box's effective parallel CPU
    * throughput in THIS window (hypervisor steal, thermal, memory-bus
    * state included). The lo/hi ratio of the control is the box's own
    * scaling ceiling, separating machine from plan in the same breath
    * as the pipeline rep it brackets.
    */
  def cpuControl(spark: SparkSession, cores: Int, opsPerTask: Long = 400000000L): Double = {
    val t0 = System.nanoTime()
    spark.sparkContext.parallelize(0 until cores, cores).map { tid =>
      var x = 0x9e3779b97f4a7c15L + tid
      var i = 0L
      while (i < opsPerTask) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      x
    }.reduce(_ ^ _)
    cores * opsPerTask / ((System.nanoTime() - t0) / 1e9)
  }

  /** Fixed-work DRAM-bandwidth control: `cores` tasks, each streaming
    * `passes` sequential sums over a private 64 MiB long[] (far beyond
    * L3 share — every element is a DRAM line). Aggregate GB/s touched.
    * The lo/hi ratio measures how the box's MEMORY subsystem scales with
    * concurrency — the other bracket around the pipeline stages, which
    * sit between register-CPU scaling (cpuControl) and this.
    */
  def memControl(spark: SparkSession, cores: Int, passes: Int = 6): Double = {
    val words = (64 << 20) / 8
    val t0 = System.nanoTime()
    spark.sparkContext.parallelize(0 until cores, cores).map { tid =>
      val a = new Array[Long](words)
      var i = 0
      while (i < words) { a(i) = tid + i; i += 1 }
      var s = 0L
      var p = 0
      while (p < passes) {
        var j = 0
        while (j < words) { s += a(j); j += 1 }
        p += 1
      }
      s
    }.reduce(_ ^ _)
    val bytes = cores.toLong * (passes + 1) * words * 8L
    bytes / ((System.nanoTime() - t0) / 1e9)
  }

  /** Fixed-work memory-LATENCY control: `cores` tasks, each doing
    * `steps` fully dependent loads over a 16M-entry random-permutation
    * walk (64 MiB working set, beyond the per-core L3 share — nearly
    * every dereference is an uncached DRAM round-trip). Aggregate
    * M-derefs/sec. This is the dimension the
    * streaming bandwidth control can NOT see: sort/hash/shuffle stages
    * are latency-bound, and this box has degradation phases where
    * bandwidth and register-CPU throughput stay normal while latency
    * collapses (observed r03: pipeline 3-4x slower with both other
    * controls healthy).
    */
  def latControl(spark: SparkSession, cores: Int, steps: Long = 20000000L): Double = {
    val t0 = System.nanoTime()
    spark.sparkContext.parallelize(0 until cores, cores).map { tid =>
      val n = 16 << 20 // 16M ints = 64 MiB of indices, walk is random
      val a = new Array[Int](n)
      var i = 0
      while (i < n) { a(i) = i; i += 1 }
      // Fisher-Yates with a cheap xorshift -> one random cycle
      var x = 0x9e3779b97f4a7c15L + tid
      i = n - 1
      while (i > 0) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        val j = ((x & 0x7fffffffffffffffL) % (i + 1)).toInt
        val t = a(i); a(i) = a(j); a(j) = t
        i -= 1
      }
      var idx = 0
      var s = 0L
      var k = 0L
      while (k < steps) { idx = a(idx); s += idx; k += 1 }
      s
    }.reduce(_ ^ _)
    cores * steps / 1e6 / ((System.nanoTime() - t0) / 1e9)
  }

  def timed(spark: SparkSession, dir: String, tag: String): Double = {
    val t0 = System.nanoTime()
    val pts = pipeline(spark, dir)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $tag pts=$pts sec=$sec%.1f pps=${(pts / sec).round}")
    pts / sec
  }

  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("PROBE_PAGES", "500000").toLong
    val dir = s"/tmp/probe_pages_$nPages"
    if (!new java.io.File(dir + "/_SUCCESS").exists()) {
      val s = session(16, 64)
      CrawlSynth.pages(s, nPages, math.max(1000, (nPages / 100).toInt), 64)
        .write.mode("overwrite").parquet(dir)
      s.stop()
    }
    val hiC = sys.env.getOrElse("PROBE_HI", "8").toInt
    val loC = sys.env.getOrElse("PROBE_LO", "2").toInt
    val sp = 64
    val hi = session(hiC, sp)
    timed(hi, dir, s"warm$hiC"); val pHi = timed(hi, dir, s"hi$hiC")
    hi.stop()
    val lo = session(loC, sp)
    timed(lo, dir, s"warm$loC"); val pLo = timed(lo, dir, s"lo$loC")
    lo.stop()
    println(f"[probe] cores $loC->$hiC efficiency=${pHi / pLo / (hiC.toDouble / loC)}%.3f")
  }
}
