package graft.queries

import graft.Q
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Driver entries for the multimodal plumbing (binary media columns,
  * batched decode, resize, frame sampling). Input is the deterministic
  * synthetic media table. The IMAGE path decodes real PNG payloads via
  * javax.imageio; the AUDIO path decodes real WAV payloads via
  * javax.sound.sampled; video decode remains a declared stub (no video
  * codec ships in this container; see Multimodal.decodeStub). Rows-only
  * checks here; numerical behavior is pinned in MultimodalSpec.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    Q(
      // batched decode -> per-kind feature profile (exercises the binary
      // column path, mapPartitions batch shape, and the stub decoder)
      "q_multimodal_decode",
      (s, _) => {
        val media = Multimodal.synthMedia(s, 3000, partitions = 8)
        Multimodal.decodeFeatures(Multimodal.resize(media, maxSide = 32))
          .toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            element_at(col("features"), 1).as("f0"))
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("f0")), 6).as("avg_f0"),
            max(col("width")).as("max_w"))
      },
      None
    ),
    Q(
      // video frame sampling (shuffle-free explode shape)
      "q_multimodal_frames",
      (s, _) => {
        val media = Multimodal.synthMedia(s, 3000, partitions = 8).toDF()
        Multimodal.sampleFrames(media, stride = 4)
          .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled"))
          .groupBy(col("n_sampled")).agg(count(lit(1)).as("n_videos"))
      },
      None
    )
  )
}
