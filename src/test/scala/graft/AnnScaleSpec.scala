package graft

import graft.ann.Ann
import org.apache.spark.sql.functions._

/** ANN at production shapes (VERDICT r02 "Next round" #6): dim=768,
  * nCells=256. The flat-matrix native expressions must (a) survive
  * codegen at these sizes (the old per-component literal trees hit the
  * JVM 64KB method limit region), (b) recover clustered structure —
  * k-means centroids are derived from the data, so a query probing its
  * top cells finds its cluster.
  */
class AnnScaleSpec extends GraftSuite {
  import spark.implicits._

  val dim = 768
  val nCenters = 20
  val perCenter = 60

  /** clustered corpus: `nCenters` random unit centers, `perCenter`
    * members each = center + small noise (members of a cluster are each
    * other's nearest neighbors).
    */
  lazy val corpus = {
    val rng = new java.util.SplittableRandom(11)
    val centers = Array.fill(nCenters)(Array.fill(dim)(rng.nextGaussian()))
    val rows = for {
      c <- 0 until nCenters
      j <- 0 until perCenter
    } yield {
      val v = centers(c).map(x => x + 0.15 * rng.nextGaussian())
      ((c * perCenter + j).toLong, v)
    }
    rows.toDF("id", "vec").repartition(8)
  }

  test("kmeans centroids are deterministic across partitionings") {
    val c1 = Ann.kmeansCentroids(corpus, 256, dim, iters = 3, sampleN = 512)
    val c2 = Ann.kmeansCentroids(corpus.repartition(3), 256, dim, iters = 3, sampleN = 512)
    assert(c1 === c2)
  }

  test("IVF at dim=768 / nCells=256: codegen-safe, recall beats random cells") {
    val cents = Ann.kmeansCentroids(corpus, 256, dim, iters = 5, sampleN = 1024)
    assert(cents.length % dim === 0)
    val queries = corpus.filter(col("id") % lit(perCenter.toLong) === 0).limit(8)
    val exact = Ann.bruteForceTopK(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 256 cells over 20 clusters splits each cluster into ~12 sub-cells;
    // nprobe=8 (3% of cells) must recover nearly all true neighbors
    val approx = Ann.ivfTopK(queries, corpus, 3, cents, dim, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.9, s"IVF recall $recall at dim=$dim nCells=256")
    // and nprobe=1 (the query's own cell only) is already decent —
    // evidence the centroids actually track the data clusters
    val own = Ann.ivfTopK(queries, corpus, 3, cents, dim, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exact intersect own).size.toDouble / exact.size > 0.3)
  }

  test("hyperplane signature at dim=768 / 32 planes is codegen-safe and stable") {
    val sigs = corpus.select(col("id"),
      Ann.hyperplaneSignature(col("vec"), planes = 32, dim = dim).as("sig"))
    val n = sigs.count()
    assert(n === nCenters.toLong * perCenter)
    // cluster members mostly share signature bits: intra-cluster Hamming
    // must be far below the ~16-bit expectation for unrelated vectors
    val ham = sigs
      .withColumn("cluster", floor(col("id") / perCenter))
      .groupBy("cluster").agg(collect_list(col("sig")).as("s"))
      .select(explode(expr(
        "transform(s, x -> bit_count(x ^ element_at(s, 1)))")).as("h"))
      .agg(avg(col("h"))).collect()(0).getDouble(0)
    assert(ham < 6.0, s"intra-cluster hamming $ham too high")
  }
}
