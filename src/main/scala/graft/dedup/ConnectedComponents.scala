package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair table — the stage that turns
  * near-duplicate PAIRS (MinHash/SimHash/embedding LSH output, see
  * [[Dedup]]) into duplicate CLUSTERS so a corpus can keep one canonical
  * document per group. The reference has no graph operators at all (its
  * dedup analogue is per-site grouping); this is engine-added surface
  * for the training-data pipeline, where pairwise near-dup output is
  * unusable until it is clustered (A~B, B~C must collapse to one group
  * even when A~C was never emitted).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * standard O(log n)-round dataflow CC. smallStar's per-node min is a
  * window over partitionBy(u) (u = the LARGER endpoint: every node's
  * smaller-neighbor list shrinks as rounds proceed, so that partition is
  * never the hot one). largeStar's Γ-min is a map-side-partial
  * aggregate joined back on u (ADVICE r05): the component-min root's Γ
  * approaches the full component near convergence, and a window there
  * would buffer that whole neighborhood in one task's frame — the
  * partial aggregate reduces it inside each map task and the join back
  * streams, with AQE skew-join able to split the root's partition. The
  * root's join output rows still land on its hash partition (bounded by
  * the largest component, which upstream candidate capping —
  * Dedup.capBuckets — keeps far below the corpus), but they stream
  * through rather than buffer. Label-propagation has the same hot key
  * WITHOUT the degree-shedding of every other node, which is why
  * star-contraction is the published corpus-scale shape.
  *
  * Driver-side state per round is one (count, checksum) row — the
  * convergence test — and lineage is truncated each round with a
  * localCheckpoint so the plan stays O(1) deep instead of O(rounds)
  * (on a cluster with a checkpoint dir configured, `checkpoint()` is
  * the durable equivalent; local mode has no such dir, and the
  * truncation semantics are identical).
  *
  * Output: one row per distinct node of the input pair table,
  * `(id, component)` with `component` = the minimum node id reachable
  * from `id` (min-id canonical labeling — deterministic, join-backable).
  * Works for any orderable id type (long doc ids, string urls).
  */
object ConnectedComponents {

  /** Edge-count gate for the driver union-find fast path: below it the
    * normalized edge set is metadata-scale (≤ ~16 MB collected) and the
    * whole contraction is one collect + one broadcast join instead of
    * O(log n) shuffle rounds — the same size-based strategy dispatch as
    * SeriesGen.autogenerate's kernel/relational switch. The star rounds
    * remain the only path above the gate (and the only shape that works
    * at corpus scale); both paths produce the identical min-reachable-id
    * labeling (ConnectedComponentsSpec pins them against each other).
    */
  val maxDriverEdges: Long = 1L << 20

  /** @param pairs undirected edges, one row per pair (self-loops and
    *              duplicate/reversed pairs are fine — normalized away)
    * @param maxRounds safety bound on star rounds; the alternation
    *                  converges in O(log²) rounds in theory and a
    *                  handful in practice — exceeding this throws
    *                  rather than returning a half-contracted labeling
    * @param driverEdgeCap override of [[maxDriverEdges]] (0 forces the
    *                      distributed star rounds — used by specs)
    */
  def connectedComponents(
      pairs: DataFrame,
      id1: String,
      id2: String,
      maxRounds: Int = 50,
      driverEdgeCap: Long = maxDriverEdges): DataFrame = {
    val nodes = pairs.select(col(id1).as("id"))
      .unionByName(pairs.select(col(id2).as("id")))
      .distinct()

    var edges = pairs
      .select(col(id1).as("u"), col(id2).as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // large-star: per node u over its FULL neighborhood Γ(u) (both edge
    // directions), connect every strictly-larger neighbor to
    // m = min(Γ(u) ∪ {u}). small-star: per node u over its
    // smaller-or-equal neighbors N(u), connect them and u itself to
    // m = min(N(u)) — edges stay oriented (larger, smaller) throughout,
    // so after convergence every edge is (node, its component min).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      // Γ-min as a map-side-partial aggregate joined back, NOT a window
      // (ADVICE r05): near convergence the component-min root's Γ
      // approaches the whole component, and a window over partitionBy(u)
      // would buffer that entire neighborhood in one task. The aggregate
      // reduces the root's rows inside each map task (combiners), so only
      // per-partition partial mins shuffle for it, and the join back is a
      // streaming equi-join AQE's skew handling can split. sym is read
      // twice, but e is a per-round localCheckpoint so the re-read is a
      // cached-block scan, not a recompute.
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("__mv"))
        .select(col("u"), least(col("u"), col("__mv")).as("m"))
      sym
        .join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("u"))
      e.withColumn("m", min(col("v")).over(w))
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // order-independent edge-set fingerprint: count + bit_xor of row
    // hashes (xor, unlike sum, cannot overflow under ANSI arithmetic;
    // the edge set is distinct so xor self-cancellation can't hide a
    // change). A 64-bit collision between two CONSECUTIVE, differing
    // edge sets would exit the loop with a half-contracted labeling
    // (ADVICE r05 — not merely an early stop); at ~2⁻⁶⁴ per round the
    // expected cost is negligible against re-verifying the set exactly
    // every round.
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = checksum(edges)

    // size dispatch: the pre-loop checksum already counted the
    // normalized edges, so the gate costs no extra job. Only id types
    // whose driver-side ordering provably matches Spark's least/greatest
    // (integrals, floating point, binary-collated strings) take the fast
    // path; anything else falls through to the star rounds.
    // integral + string ids only: for these, boxed equality and the
    // driver comparator provably match Spark's =/least semantics
    // (floating-point ids would diverge on -0.0/0.0 and NaN — they fall
    // through to the star rounds, which are type-agnostic)
    val idType = pairs.schema(id1).dataType
    val orderable = idType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.StringType => true
      case _ => false
    }
    if (prev._1 <= driverEdgeCap && orderable) {
      val labels = driverUnionFind(edges.collect())
      edges.unpersist(false)
      val spark = pairs.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("__root", idType)))
      import scala.jdk.CollectionConverters._
      val labelDf = spark.createDataFrame(
        labels.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava, schema)
      return nodes
        .join(broadcast(labelDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("__root"), col("id")).as("component"))
    }

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges))
        .localCheckpoint(true) // truncate lineage; also materializes
      val sig = checksum(next)
      edges.unpersist()
      edges = next
      converged = sig == prev
      prev = sig
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds star rounds " +
          "— raise maxRounds (alternating stars need O(log n) rounds; " +
          "this many suggests a pathological or corrupt pair table)")

    // converged edge set = (child, componentMin) for every non-root
    // node; roots map to themselves
    nodes
      .join(edges.select(col("u").as("id"), col("v").as("__root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__root"), col("id")).as("component"))
  }

  /** strict less-than matching Spark's least/greatest for the id types
    * admitted by the fast-path gate: unsigned byte-wise UTF-8 compare for
    * strings (binary collation), natural order for numerics.
    */
  private def idLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: String, y: String) =>
      val xb = x.getBytes("UTF-8"); val yb = y.getBytes("UTF-8")
      val n = math.min(xb.length, yb.length)
      var i = 0
      while (i < n) {
        val c = (xb(i) & 0xff) - (yb(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      xb.length < yb.length
    case (x: java.lang.Number, y: java.lang.Number) =>
      if (x.isInstanceOf[java.lang.Double] || x.isInstanceOf[java.lang.Float])
        x.doubleValue < y.doubleValue
      else x.longValue < y.longValue
    case _ => throw new IllegalStateException(s"unorderable id: $a") // gate excludes
  }

  /** driver-side union-find with path halving over a collected,
    * normalized edge set (≤ driverEdgeCap rows); returns one
    * (id, componentMinId) row per node appearing in the edges — the
    * identical labeling the star rounds converge to.
    */
  private def driverUnionFind(edges: Array[org.apache.spark.sql.Row]): Seq[(Any, Any)] = {
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent(x) = gp // path halving
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    edges.foreach { r =>
      val a = r.get(0); val b = r.get(1)
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(ra) = rb
    }
    val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
    val nodes = parent.keys.toSeq
    nodes.foreach { n =>
      val r = find(n)
      minOf.get(r) match {
        case Some(m) => if (idLt(n, m)) minOf(r) = n
        case None    => minOf(r) = n
      }
    }
    nodes.map(n => (n, minOf(find(n))))
  }

  /** Near-duplicate clusters end-to-end: pairs → components → one row
    * per multi-member cluster with the canonical (minimum) id, the
    * member count, and the sorted member list. `collect_list` per
    * component is bounded by cluster size — a duplicate cluster, not
    * the corpus; callers with pathological mega-clusters should cap
    * upstream (Dedup.capBuckets already bounds what LSH can emit).
    */
  def clusters(pairs: DataFrame, id1: String, id2: String): DataFrame =
    connectedComponents(pairs, id1, id2)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        sort_array(collect_list(col("id"))).as("member_ids"))
}
