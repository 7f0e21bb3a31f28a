package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming anomaly detection over tier points — the streaming
  * analogue of Tiers.anomalyFlags' spike screen (ctas R/ctas.R:1259-1271
  * is the batch Tukey-fence ancestor; here the per-series state is a
  * Welford running (n, mean, M2) so the detector is single-pass and
  * incremental).
  *
  * Uses `flatMapGroupsWithState` (SURVEY.md §2.2 Streaming row: custom
  * state via KeyValueGroupedDataset): one state object per series_id,
  * constant-size, merged per micro-batch — at 10^8 series this is a
  * hash-partitioned state store keyed by series, the same layout the
  * hourly tier shuffle already uses, so no extra shuffle shape appears
  * at scale. Event-time ordering inside a micro-batch is restored by a
  * local sort (cross-batch ordering is the caller's watermark concern).
  */
object StreamingAnomaly {

  case class PointIn(series_id: String, bucket: Long, value: Double)

  case class SeriesState(n: Long, mean: Double, m2: Double)

  case class AnomalyOut(
      series_id: String, bucket: Long, value: Double, z: Double, n_seen: Long)

  /** Emit a row for every point whose z-score against the series' state
    * BEFORE the point exceeds `zThreshold` (after at least `minN` points
    * have been absorbed). Works identically on a batch Dataset (state
    * lives for the single batch) and a streaming one (state persists
    * across micro-batches in the state store).
    *
    * `zGrid` > 0 quantizes z to the dyadic grid k/zGrid
    * (floor(z*g + 0.5)/g, exact in binary FP) before the threshold
    * compare AND in the emitted row, so the anomaly set survives
    * last-ulp drift between this incremental Welford state and any
    * two-pass recomputation (cross-engine oracle, replica reconciliation
    * — ADVICE r02): the ~1e-12 algorithmic drift is far below the cell
    * size, so both computations land in the same cell.
    */
  def detect(points: Dataset[PointIn], minN: Int = 5, zThreshold: Double = 4.0,
      zGrid: Long = 0L): Dataset[AnomalyOut] = {
    def qz(z: Double): Double =
      if (zGrid > 0) math.floor(z * zGrid + 0.5) / zGrid else z
    implicit val stEnc = Encoders.product[SeriesState]
    implicit val outEnc = Encoders.product[AnomalyOut]
    points
      .groupByKey(_.series_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sid: String, it: Iterator[PointIn], state: GroupState[SeriesState]) => {
          var st = state.getOption.getOrElse(SeriesState(0L, 0.0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyOut]
          it.toArray.sortBy(_.bucket).foreach { p =>
            if (st.n >= minN && st.n > 1) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0) {
                val z = qz((p.value - st.mean) / sd)
                if (math.abs(z) > zThreshold)
                  out += AnomalyOut(sid, p.bucket, p.value, z, st.n)
              }
            }
            // Welford update
            val n1 = st.n + 1
            val delta = p.value - st.mean
            val mean1 = st.mean + delta / n1
            st = SeriesState(n1, mean1, st.m2 + delta * (p.value - mean1))
          }
          state.update(st)
          out.iterator
        })
  }
}
