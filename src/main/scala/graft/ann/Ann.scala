package graft.ann

import graft.stats.Stats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - bruteForceTopK: exact cosine top-k via a bucketable cross join —
  *    the correctness baseline (O(Q·N), only for bounded query sets);
  *  - random-hyperplane LSH signatures + bucketed search — the scale
  *    path: candidates share a signature bucket (or a neighboring probe),
  *    exact cosine re-ranking inside buckets only.
  *
  * Hyperplanes are derived deterministically from a seeded inverse-normal
  * hash (no RNG state, reproducible on any cluster size).
  */
object Ann {

  def cosine(a: Column, b: Column): Column = graft.dedup.Dedup.cosine(a, b)

  /** Exact top-k neighbors for each query vector. queries and corpus are
    * (id, vec array<double>); self-pairs excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** deterministic hyperplane component for (plane p, dimension d):
    * standard normal via splitmix-avalanched hash -> inverse CDF.
    */
  def planeComponent(p: Int, d: Int): Double =
    Stats.jitter(Stats.hash64(s"plane|$p|$d"), 1.0)

  /** LSH signature: `planes` sign bits of <v, h_p> packed into a long.
    * planeOffset selects an independent hyperplane family (one per
    * hash table).
    */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int,
      planeOffset: Int = 0): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until planes).map { p =>
      val comps = (0 until dim).map(d => lit(planeComponent(planeOffset + p, d)))
      val dot = aggregate(
        zip_with(v, array(comps: _*), (x, h) => x * h),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN top-k with `tables` independent hyperplane tables:
    * each side gets one (table, signature) row per table, candidates are
    * bucket-joined on (table, sig) and deduped, then exact cosine
    * re-ranks per query. Recall ~ 1-(1-r)^tables for single-table
    * recall r; at 10^12 scale the same shape shuffles once per table on
    * the bucket key, never O(n²).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 8, dim: Int = 64, tables: Int = 4): DataFrame = {
    def sigs(df: DataFrame) = df.select(col("id"), col("vec"),
      posexplode(array((0 until tables).map(t =>
        hyperplaneSignature(col("vec"), planes, dim, t * planes)): _*))
        .as(Seq("table", "sig")))
    val q = sigs(queries).select(col("table"), col("sig"),
      col("id").as("query_id"), col("vec").as("qv"))
    val c = sigs(corpus).select(col("table"), col("sig"),
      col("id").as("neighbor_id"), col("vec").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(c, Seq("table", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF-style coarse quantization: assign every vector to its nearest
    * of `nCells` deterministic centroid directions, search only the
    * query's cell (plus optional neighboring probes).
    */
  def ivfAssign(df: DataFrame, nCells: Int, dim: Int): DataFrame = {
    val v = col("vec").cast("array<double>")
    val cellSims = (0 until nCells).map { cIdx =>
      val comps = (0 until dim).map(d => lit(planeComponent(1000 + cIdx, d)))
      struct(
        aggregate(zip_with(v, array(comps: _*), (x, h) => x * h),
          lit(0.0), (acc, x) => acc + x).as("sim"),
        lit(cIdx).as("cell"))
    }
    df.withColumn("cell", greatest(cellSims: _*).getField("cell"))
  }

  /** IVF search: corpus vectors are bucketed into their nearest centroid
    * cell once; each query probes its `nprobe` highest-scoring cells.
    * Candidates come from a (cell) equi-join — one shuffle on the cell
    * key, never O(Q·N) — and exact cosine re-ranks inside the probed
    * cells. Complements lshTopK (recall measured against bruteForceTopK
    * in DedupAnnSpec).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, dim: Int = 64, nprobe: Int = 4): DataFrame = {
    val c = ivfAssign(corpus, nCells, dim)
      .select(col("cell"), col("id").as("neighbor_id"), col("vec").as("cv"))
    // per-query top-nprobe cells: sort (−sim, cell) structs ascending
    val v = col("vec").cast("array<double>")
    val cellScores = (0 until nCells).map { cIdx =>
      val comps = (0 until dim).map(d => lit(planeComponent(1000 + cIdx, d)))
      struct(
        (-aggregate(zip_with(v, array(comps: _*), (x, h) => x * h),
          lit(0.0), (acc, x) => acc + x)).as("negsim"),
        lit(cIdx).as("cell"))
    }
    val probed = transform(
      slice(sort_array(array(cellScores: _*)), 1, nprobe),
      s => s.getField("cell"))
    val q = queries
      .select(col("id").as("query_id"), col("vec").as("qv"),
        explode(probed).as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
