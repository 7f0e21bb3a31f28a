package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed in batched
  * per-partition operators (the Scala analogue of `mapInPandas` — one
  * buffer of rows per batch, amortizing per-batch codec setup).
  *
  * The actual byte-level DECODE IS A STUB in this container (no image /
  * audio codecs ship with /opt/spark/jars): `decodeStub` produces a
  * deterministic fake decode from the bytes. Everything around it —
  * schema, binary handling, batch shape, partition parallelism, the
  * resize / frame-sample operators — is real and tested; swapping
  * `decodeStub` for a JNI/javax codec is a one-function change.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  case class DecodedRow(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** Deterministic synthetic media table (binary payload + metadata). */
  def synthMedia(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val rng = new java.util.SplittableRandom(id)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val w = 16 + rng.nextInt(48)
      val h = 16 + rng.nextInt(48)
      val frames = if (kind == "video") 8 + rng.nextInt(24) else 1
      val bytes = new Array[Byte](w * h)
      rng.nextBytes(bytes)
      MediaRow(id, kind, bytes, w, h, frames)
    }
  }

  /** STUB decode: a deterministic 8-dim "feature vector" from the raw
    * bytes (byte-histogram moments). Replace with a real codec to
    * decode actual media; the signature and batch shape stay the same.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 5) += 1
      i += 1
    }
    val n = math.max(1, bytes.length).toFloat
    hist.map(_ / n)
  }

  /** Batched decode/feature-extract: processes each partition in fixed-
    * size batches (the mapInPandas batch shape) so a real codec could
    * allocate per-batch buffers once.
    */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec contexts, buffers)
        batch.iterator.map { r =>
          DecodedRow(r.media_id, r.kind, r.width, r.height, r.n_frames,
            decodeStub(r.bytes))
        }
      }
    }
  }

  /** Resize plumbing: recompute metadata + proportionally subsample the
    * payload (stub for a real resampler; keeps bytes-per-pixel shape).
    */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(r.width, r.height))
      if (scale >= 1.0) r
      else {
        val w = math.max(1, (r.width * scale).toInt)
        val h = math.max(1, (r.height * scale).toInt)
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < out.length) {
          out(i) = r.bytes((i.toDouble / out.length * r.bytes.length).toInt)
          i += 1
        }
        r.copy(bytes = out, width = w, height = h)
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index,
    * emitted as (media_id, frame_idx) — the shuffle-free explode shape
    * a real frame extractor would feed.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_idx"))
}
