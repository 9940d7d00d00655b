package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed in partition-local batches.
  *
  * Image payloads decode for REAL through `javax.imageio` (PNG/JPEG/
  * GIF/BMP ship with the JDK — no external libs needed): true
  * dimensions, channel count from the color model, and stripe-mean
  * luminance features. Audio payloads decode for REAL through
  * `javax.sound.sampled` (WAV/AIFF/AU PCM parsing also ships with the
  * JDK): sample rate, channel count, frame count, and per-stripe RMS
  * amplitude. Only VIDEO codecs are genuinely absent from this
  * container, so video mimes (and image/audio payloads the JDK can't
  * sniff) fall back to a clearly marked deterministic STUB. The Spark
  * mechanics are what matter at 100 TB and are real throughout:
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

  /** Real image decode via the JDK's `javax.imageio` (PNG, JPEG, GIF,
    * BMP). Returns None when the payload isn't a decodable image so
    * the caller can fall back to the stub — asMedia's text-as-bytes
    * payloads, for instance, never sniff as an image format.
    * Features are mean luminance over 8 horizontal stripes (the last
    * stripe absorbs residual rows), so a lossless format (PNG) decodes
    * to exactly reproducible statistics. */
  private def decodeImage(b: MediaRow): Option[Decoded] = {
    if (b.payload == null || b.payload.length == 0) None
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
        catch { case _: Exception => null } // truncated/hostile payload → fallback
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        val feats = new Array[Float](8)
        if (w > 0 && h > 0) {
          val sums = new Array[Double](8)
          val counts = new Array[Long](8)
          val stripe = math.max(h / 8, 1)
          // one bulk getRGB per ROW, not per pixel — the per-pixel
          // overload re-does bounds checks and color-model conversion
          // 12M times on a 4000×3000 frame
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            val s = math.min(y / stripe, 7)
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = rowBuf(x)
              sums(s) += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              counts(s) += 1
              x += 1
            }
            y += 1
          }
          var j = 0
          while (j < 8) { if (counts(j) > 0) feats(j) = (sums(j) / counts(j)).toFloat; j += 1 }
        }
        Some(Decoded(b.doc_id, w, h, channels, b.payload.length, feats))
      }
    }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV, AIFF,
    * AU). Returns None when the payload isn't a parseable audio file so
    * the caller can fall back to the stub — asMedia's text-as-bytes
    * payloads never carry a RIFF/FORM header, so they never sniff as
    * audio. The stream is normalized to signed 16-bit little-endian PCM
    * at the source rate/channel count (the JDK converts 8-bit, unsigned
    * and big-endian variants), then features are per-stripe RMS
    * amplitude over 8 time stripes of mono-mixed frames, normalized to
    * [0, 1] by full scale (32768) — the windowed energy statistics an
    * audio-quality filter gates on. Decoded mapping for audio:
    * width = frame count, height = sample rate (Hz), channels =
    * channel count. */
  private def decodeAudio(b: MediaRow): Option[Decoded] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (b.payload == null || b.payload.length == 0) None
    else {
      val in =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b.payload))
        catch { case _: Exception => null } // no audio header → fallback
      if (in == null) None
      else try {
        val fmt = in.getFormat
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, fmt.getSampleRate, 16,
          fmt.getChannels, 2 * fmt.getChannels, fmt.getSampleRate, false)
        val pcm =
          try AudioSystem.getAudioInputStream(target, in)
          catch { case _: Exception => null } // unconvertible encoding → fallback
        if (pcm == null) None
        else {
          val bytes = pcm.readAllBytes()
          val ch = target.getChannels
          val nFrames = bytes.length / (2 * ch)
          val feats = new Array[Float](8)
          if (nFrames > 0) {
            val sums = new Array[Double](8)
            val counts = new Array[Long](8)
            val stripe = math.max(nFrames / 8, 1)
            var f = 0
            while (f < nFrames) {
              val s = math.min(f / stripe, 7)
              // mono mix: mean over the frame's channel samples
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val i = 2 * (f * ch + c)
                acc += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
                c += 1
              }
              val m = acc / ch
              sums(s) += m * m
              counts(s) += 1
              f += 1
            }
            var j = 0
            while (j < 8) {
              if (counts(j) > 0)
                feats(j) = (math.sqrt(sums(j) / counts(j)) / 32768.0).toFloat
              j += 1
            }
          }
          Some(Decoded(b.doc_id, nFrames, math.round(fmt.getSampleRate),
            ch, b.payload.length, feats))
        }
      } catch { case _: Exception => None } // truncated/hostile payload → fallback
      finally { try in.close() catch { case _: Exception => () } }
    }
  }

  /** Motion-JPEG frame boundaries: offsets where a JPEG SOI marker
    * (FF D8 FF) begins. Entropy-coded JPEG data cannot contain the
    * triple (FF is byte-stuffed as FF 00 or followed by RST markers
    * D0–D7), so SOI triples delimit frames in a concatenated-JPEG
    * stream. A pathological APPn segment whose payload bytes spell
    * FF D8 FF would over-split — acceptable for a codec whose
    * contract is "MJPEG as written by a JPEG encoder". */
  private def mjpegFrameOffsets(p: Array[Byte]): IndexedSeq[Int] = {
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < p.length) {
      if ((p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == 0xd8 &&
          (p(i + 2) & 0xff) == 0xff) { offs += i; i += 3 }
      else i += 1
    }
    offs.toIndexedSeq
  }

  /** True iff the payload sniffs as JPEG content (starts at a SOI
    * marker) — the gate between the real Motion-JPEG frame path and
    * the stub chunker for unsniffable payloads. */
  private def sniffsJpeg(p: Array[Byte]): Boolean =
    p != null && p.length >= 3 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff

  /** Real video decode for Motion-JPEG payloads: split into JPEG
    * frames, take dimensions/channels from the first DECODABLE frame
    * (MJPEG frames share geometry; a truncated leading frame must not
    * stub out the video), and summarize the video as per-stripe
    * means of the per-frame mean luminance over 8 time stripes — the
    * temporal-activity statistics a video-curation gate reads. None
    * when the payload doesn't sniff as MJPEG or no frame decodes, so
    * the caller falls back to the stub. */
  private def decodeVideo(b: MediaRow): Option[Decoded] = {
    if (!sniffsJpeg(b.payload)) None
    else {
      javax.imageio.ImageIO.setUseCache(false)
      val offs = mjpegFrameOffsets(b.payload)
      val bounds = offs :+ b.payload.length
      val frames = bounds.sliding(2).collect {
        case IndexedSeq(a, z) if z > a => java.util.Arrays.copyOfRange(b.payload, a, z)
      }.toIndexedSeq
      // ONE decode pass: each frame's image is read once and feeds both
      // the geometry probe and the luminance statistic (a corrupt frame
      // decodes to null and degrades to its byte mean — per frame, not
      // for the whole video)
      val decoded = frames.map { f =>
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
        catch { case _: Exception => null }
      }
      // geometry from the FIRST DECODABLE frame: a truncated leading
      // frame must not stub out an otherwise-decodable video
      decoded.find(img => img != null && img.getWidth > 0 && img.getHeight > 0).map { first =>
        val means = frames.zip(decoded).map { case (f, img) =>
          if (img != null && img.getWidth > 0 && img.getHeight > 0) imageMeanLuminance(img)
          else byteMean(f)
        }
        val feats = new Array[Float](8)
        val counts = new Array[Int](8)
        val stripe = math.max(frames.size / 8, 1)
        means.zipWithIndex.foreach { case (m, i) =>
          val j = math.min(i / stripe, 7)
          feats(j) += m.toFloat; counts(j) += 1
        }
        var j = 0
        while (j < 8) { if (counts(j) > 0) feats(j) = feats(j) / counts(j); j += 1 }
        Decoded(b.doc_id, first.getWidth, first.getHeight,
          first.getColorModel.getNumComponents, b.payload.length, feats)
      }
    }
  }

  private def byteMean(bytes: Array[Byte]): Double =
    if (bytes == null || bytes.isEmpty) 0.0
    else {
      var s = 0L; var i = 0
      while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
      s.toDouble / bytes.length
    }

  /** Mean luminance ((r+g+b)/3 per pixel) of a decoded image. */
  private def imageMeanLuminance(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    var s = 0L
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s.toDouble / (3.0 * w * h)
  }

  /** Mean luminance of one JPEG frame payload; falls back to the raw
    * byte mean for an undecodable payload so a truncated frame
    * degrades instead of failing. */
  private def jpegFrameMean(bytes: Array[Byte]): Double = {
    if (!sniffsJpeg(bytes)) byteMean(bytes)
    else {
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0) byteMean(bytes)
      else imageMeanLuminance(img)
    }
  }

  /** STUB codec ??? — deterministic fake standing in for genuinely
    * undecodable payloads (a claimed mime whose bytes the JDK can't
    * sniff as that format). Dimensions
    * derive from payload size, "pixel" statistics from the raw bytes,
    * so results are reproducible and schema/batching are exercised for
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
      // per-executor codec setup: ImageIO's default ImageInputStream
      // cache spills to temp FILES — in-memory payloads must never
      // touch executor local disk
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup (reader pools etc.) amortizes here
        batch.iterator.map { m =>
          // null mime (a null source column) must not NPE the executor
          // — same defensive rule as the stub's null payload
          if (m.mime != null && m.mime.startsWith("image/"))
            decodeImage(m).getOrElse(decodeStub(m))
          else if (m.mime != null && m.mime.startsWith("audio/"))
            decodeAudio(m).getOrElse(decodeStub(m))
          else if (m.mime != null && m.mime.startsWith("video/"))
            decodeVideo(m).getOrElse(decodeStub(m))
          else decodeStub(m)
        }
      }
    }
  }

  case class PHashRow(doc_id: Long, phash: String)

  /** Perceptual AVERAGE HASH (aHash) for image near-dup detection:
    * 64 bits, bit j set iff grid cell j's mean intensity exceeds the
    * payload's global mean. The compare is an exact integer
    * cross-multiply (cellSum·totalCount > totalSum·cellCount — no
    * float mean ever computed), so the hash is bit-reproducible
    * everywhere, and the bit STRING representation keeps it portable
    * (a packed int64 would overflow signed arithmetic at bit 63).
    *
    * Real images (ImageIO-decodable): the classic 8×8 spatial grid
    * over per-pixel r+g+b integer sums — identical content hashes
    * identically, small perturbations flip few bits (hamming ≤ k
    * near-dup rule). Stub payloads: 64 byte-stripes in
    * [[decodeStub]]'s stripe convention — deterministic and exactly
    * reproducible in SQL, which is what the q_image_phash oracle
    * checks while MultimodalSpec covers the real-pixel path. */
  private def stubGridBits(m: MediaRow): String = {
    val p = if (m.payload == null) Array.emptyByteArray else m.payload
    val n = p.length
    val cs = new Array[Long](64)
    val cc = new Array[Long](64)
    var ts = 0L
    if (n > 0) {
      val stripe = math.max(n / 64, 1)
      var i = 0
      while (i < n) {
        val j = math.min(i / stripe, 63)
        val v = (p(i) & 0xff).toLong
        cs(j) += v; cc(j) += 1; ts += v
        i += 1
      }
    }
    val tc = n.toLong
    val sb = new StringBuilder(64)
    var j = 0
    while (j < 64) {
      sb.append(if (cc(j) > 0 && cs(j) * tc > ts * cc(j)) '1' else '0')
      j += 1
    }
    sb.toString
  }

  private def imageGridBits(m: MediaRow): Option[String] = {
    if (m.mime == null || !m.mime.startsWith("image/") ||
        m.payload == null || m.payload.isEmpty) None
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        catch { case _: Exception => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val cs = new Array[Long](64)
        val cc = new Array[Long](64)
        var ts = 0L
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          val gy = math.min(y * 8 / h, 7)
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var x = 0
          while (x < w) {
            val rgb = rowBuf(x)
            val v = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
            val j = gy * 8 + math.min(x * 8 / w, 7)
            cs(j) += v; cc(j) += 1; ts += v
            x += 1
          }
          y += 1
        }
        val tc = w.toLong * h
        val sb = new StringBuilder(64)
        var j = 0
        while (j < 64) {
          sb.append(if (cc(j) > 0 && cs(j) * tc > ts * cc(j)) '1' else '0')
          j += 1
        }
        Some(sb.toString)
      }
    }
  }

  /** Batched aHash over a media column — the image-dedup signature
    * pass (narrow mapPartitions, same batch shape as
    * [[decodeBatched]]); group equal hashes (or hamming ≤ k bands)
    * downstream for near-dup clusters. */
  def aHash(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[PHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          PHashRow(m.doc_id, imageGridBits(m).getOrElse(stubGridBits(m)))
        }
      }
    }
  }

  /** Frame sampling for video payloads: a payload that sniffs as
    * Motion-JPEG splits at its real SOI frame boundaries
    * ([[mjpegFrameOffsets]]) and every `stride`-th JPEG frame becomes
    * a frame row; an unsniffable payload falls back to the stub
    * 64-byte chunker (which is also what the q_multimodal_frames
    * oracle reproduces in SQL over the text-as-bytes corpus). Output:
    * (doc_id, frame_no, frame binary) — frame_no is the index in the
    * FULL frame sequence, so stride sampling is visible downstream. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(m => m.mime != null && m.mime.startsWith("video/") && m.payload != null)
      .flatMap { m =>
        if (sniffsJpeg(m.payload)) {
          val bounds = mjpegFrameOffsets(m.payload) :+ m.payload.length
          bounds.sliding(2).collect {
            case IndexedSeq(a, z) if z > a =>
              java.util.Arrays.copyOfRange(m.payload, a, z)
          }.zipWithIndex.collect {
            case (frame, i) if i % stride == 0 => (m.doc_id, i, frame)
          }
        } else {
          m.payload.grouped(64).zipWithIndex.collect {
            case (chunk, i) if i % stride == 0 => (m.doc_id, i, chunk)
          }
        }
      }.toDF("doc_id", "frame_no", "frame")
  }

  case class FrameStat(doc_id: Long, frame_no: Int, mean_byte: Double)

  /** Scene-change KEYFRAME selection over the sampled frames — the
    * video-curation step that turns a frame stream into the sparse set
    * a captioning/embedding stage actually processes. Per frame one
    * narrow statistic — REAL mean luminance for decodable JPEG frames
    * ([[jpegFrameMean]], so an MJPEG payload's scene cuts are detected
    * on actual pixels), raw byte mean for stub chunks — then ONE
    * window per doc (LAG over frame_no) and a threshold gate on the
    * inter-frame difference; the first frame is always a keyframe.
    * Shape notes for 100 TB: the per-frame map is
    * embarrassingly parallel, the window shuffles once on doc_id, and
    * the output carries the flag rather than filtering so a downstream
    * stage can choose its own sparsity. */
  def keyFrames(media: Dataset[MediaRow], stride: Int = 4,
                threshold: Double = 8.0): DataFrame = {
    import media.sparkSession.implicits._
    val stats = sampleFrames(media, stride)
      .as[(Long, Int, Array[Byte])]
      .map { case (id, no, bytes) =>
        FrameStat(id, no, if (bytes == null || bytes.isEmpty) 0.0 else jpegFrameMean(bytes))
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_no")
    stats.toDF()
      .withColumn("prev_mean", lag(col("mean_byte"), 1).over(w))
      .withColumn("is_keyframe",
        (col("prev_mean").isNull ||
          abs(col("mean_byte") - col("prev_mean")) > threshold).cast("boolean"))
  }
}
