package graft.sketch

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact distributed heavy hitters with bounded state (engine-added
  * training-pipeline operator; the reference has no analogue — its
  * per-site frequency logic is all exact small-cardinality group-bys,
  * R/ctas.R:823/866).
  *
  * The naive "heavy items" plan — `groupBy(item).count().filter(...)` —
  * shuffles ONE ROW PER DISTINCT ITEM. Over 100 TB of crawl pages the
  * item domain (URLs, hosts, shingles) is billions of keys, so the
  * exact-count shuffle is the bottleneck even though the answer is tiny.
  * The classic two-pass shape keeps every stage bounded by k, not by the
  * domain:
  *
  *  pass 1 — a mergeable Misra-Gries summary (Agarwal et al., "Mergeable
  *    Summaries", PODS 2012): each partition keeps <= k-1 counters,
  *    partial states merge associatively in Spark's partial/final
  *    aggregation, and the merged summary is GUARANTEED to contain every
  *    item with true count > n/k (deterministic, no failure probability).
  *    Shuffled state: one <=(k-1)-entry map per partition.
  *  pass 2 — exact counts of the <= k-1 candidates only: a codegen'd
  *    `isin` filter (no join) in front of a hash aggregate over <= k
  *    groups, plus a 1-row broadcast of the total to apply the n/k
  *    threshold declaratively. Map-side partials make the shuffle O(k)
  *    per partition.
  *
  * The only driver-side materialization is the candidate list (< k
  * strings) — bounded metadata, not a data path.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries summary over string items, k-1 counters.
    *
    * reduce: increment if tracked; insert if room; otherwise decrement
    * every counter (the MG step — each decrement "cancels" k distinct
    * occurrences, of which at most n/k can hit any single item, hence
    * the undercount of any item is <= n/k and every item with count >
    * n/k survives).
    * merge: add counters, then subtract the k-th largest value from all
    * and drop the non-positive — the PODS'12 merge that preserves the
    * n/k error bound across partial states.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {
    require(k >= 2, s"heavy-hitter k must be >= 2, got $k")

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(m: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
      m.get(item) match {
        case Some(c) => m.update(item, c + 1L)
        case None if m.size < k - 1 => m.update(item, 1L)
        case None =>
          // decrement-all; O(k) but amortized O(1) per input (each unit
          // of count is added once and removed at most once)
          val dead = m.iterator.collect { case (i, 1L) => i }.toList
          m.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(m.remove)
      }
      m
    }

    def merge(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (i, c) => a.update(i, a.getOrElse(i, 0L) + c) }
      if (a.size > k - 1) {
        // k-th largest counter value is the subtraction offset
        val vals = a.values.toArray
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - k)
        val kept = a.iterator.collect { case (i, c) if c > cut => (i, c - cut) }.toSeq
        mutable.HashMap.from(kept)
      } else a
    }

    def finish(m: mutable.HashMap[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (i, c) => (-c, i) }

    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Candidate pass only: the merged Misra-Gries summary (item,
    * lower-bound count), a superset of all items with count > n/k.
    */
  def candidates(df: DataFrame, itemCol: String, k: Int): Seq[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[String]
      .select(new MisraGries(k).toColumn.name("summary"))
      .head()
  }

  /** EXACT heavy hitters: all items whose count strictly exceeds n/k
    * (n = non-null rows), as (item, cnt) — never a full distinct-key
    * shuffle. Output is exact (not estimated): pass 2 recounts the MG
    * candidates precisely and applies the threshold, so both false
    * positives and undercounts from pass 1 are eliminated.
    */
  def exactOverThreshold(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val cands = candidates(df, itemCol, k).map(_._1)
    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    // non-candidates fold into the null group so ONE tiny aggregate
    // yields both the candidate counts and (as the group sum) n.
    // Persisted (ADVICE r05): `counts` is <= k rows but is referenced by
    // both the broadcast-total branch and the filter branch — without
    // the pin pass 2 re-ran the full input scan+aggregate when
    // ReuseExchange didn't fire, making the "two-pass" shape three scans.
    val counts = items
      .groupBy(when(col("item").isin(cands: _*), col("item")).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    counts.filter(col("item").isNotNull)
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n_total"))
      .select(col("item"), col("cnt"), col("n_total"))
  }
}
