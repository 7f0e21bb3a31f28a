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
  * standard O(log n)-round dataflow CC. Each half-round is ONE hash
  * exchange on the node id (the per-node neighborhood min is a window
  * aggregate over that partitioning, not a groupBy+join) plus the
  * distinct that keeps the edge multiset a set. No step ever holds a
  * component on one task — only a node's direct neighborhood meets in
  * one place, and both stars strictly shrink high-degree neighborhoods
  * toward the component minimum, so hot nodes lose degree as rounds
  * proceed rather than accumulating it. This is why label-propagation
  * (component-sized state per key) is the wrong shape at corpus scale
  * and star-contraction is the published one.
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

  /** @param pairs undirected edges, one row per pair (self-loops and
    *              duplicate/reversed pairs are fine — normalized away)
    * @param maxRounds safety bound on star rounds; the alternation
    *                  converges in O(log²) rounds in theory and a
    *                  handful in practice — exceeding this throws
    *                  rather than returning a half-contracted labeling
    */
  def connectedComponents(
      pairs: DataFrame,
      id1: String,
      id2: String,
      maxRounds: Int = 50): DataFrame = {
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
      val w = Window.partitionBy(col("u"))
      sym
        .withColumn("m", least(col("u"), min(col("v")).over(w)))
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
    // change, and a 64-bit collision merely stops one round early)
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = checksum(edges)
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
