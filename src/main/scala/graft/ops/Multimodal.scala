package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed in partition-local batches.
  *
  * The actual codecs (JPEG decode, resampling, frame extraction) are
  * NOT available in this container — the decode step is a clearly
  * marked deterministic STUB. Everything around it is the real Spark
  * mechanics and is what matters at 100 TB:
  *  - binary payload + metadata struct schema,
  *  - `mapPartitions` with bounded batch grouping (the JVM shape of
  *    `mapInPandas`: amortize per-batch codec setup, bound memory by
  *    batch size × payload size, never materialize a partition),
  *  - typed Dataset output with fixed-width feature vectors.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class Decoded(doc_id: Long, width: Int, height: Int, channels: Int,
                     n_bytes: Int, features: Array[Float])

  /** Wrap a text corpus as fake media payloads (binary + mime). */
  def asMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image/jpeg"))
        .when(col("doc_id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("mime"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }

  /** STUB codec ??? — deterministic fake standing in for the real
    * decode (no image/audio libs in this container). Dimensions derive
    * from payload size, "pixel" statistics from the raw bytes, so
    * results are reproducible and schema/batching are exercised for
    * real. A production build swaps only this function's body. */
  private def decodeStub(b: MediaRow): Decoded = {
    // NULL payload (e.g. a null source column cast to binary) decodes
    // as an empty payload rather than NPE-ing the executor
    val payload = if (b.payload == null) Array.emptyByteArray else b.payload
    val n = payload.length
    val w = n % 317 + 16
    val h = n % 211 + 16
    val c = (n % 3) + 1
    // 8 "features": mean byte value over 8 payload stripes (the last
    // stripe absorbs the residual bytes, so each mean divides by the
    // stripe's ACTUAL byte count)
    val feats = new Array[Float](8)
    if (n > 0) {
      val counts = new Array[Int](8)
      var i = 0
      val stripe = math.max(n / 8, 1)
      while (i < n) {
        val j = math.min(i / stripe, 7)
        feats(j) += (payload(i) & 0xff).toFloat
        counts(j) += 1
        i += 1
      }
      var j = 0
      while (j < 8) { if (counts(j) > 0) feats(j) = feats(j) / counts(j); j += 1 }
    }
    Decoded(b.doc_id, w, h, c, n, feats)
  }

  /** Batched decode: partition-local iterator grouped into bounded
    * batches (the mapInPandas batch shape). Lazy end-to-end — no
    * partition is ever materialized whole. */
  def decodeBatched(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would go here (amortized across rows)
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th 64-byte
    * chunk becomes a frame row (doc_id, frame_no, frame binary). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(m => m.mime == "video/mp4" && m.payload != null).flatMap { m =>
      m.payload.grouped(64).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => (m.doc_id, i, chunk)
      }
    }.toDF("doc_id", "frame_no", "frame")
  }
}
