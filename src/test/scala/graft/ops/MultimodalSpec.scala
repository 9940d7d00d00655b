package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMedia(graft.Tables.documents(spark, sf001))

  test("asMedia: payload bytes round-trip the text, mime cycles") {
    val docs = graft.Tables.documents(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    media.collect().take(20).foreach { m =>
      assert(new String(m.payload, "UTF-8") === docs(m.doc_id))
      assert(Set("image/jpeg", "audio/wav", "video/mp4")(m.mime))
    }
  }

  test("decodeBatched: deterministic dims/features, one row per payload") {
    val out = Multimodal.decodeBatched(media, batchSize = 16).collect()
    assert(out.length === media.count())
    out.foreach { d =>
      assert(d.width === d.n_bytes % 317 + 16)
      assert(d.height === d.n_bytes % 211 + 16)
      assert(d.channels === d.n_bytes % 3 + 1)
      assert(d.features.length === 8)
      assert(d.features.forall(f => f >= 0f && f <= 8 * 255f))
    }
    // determinism: second run bit-identical
    val again = Multimodal.decodeBatched(media, batchSize = 16).collect()
    assert(out.sortBy(_.doc_id).zip(again.sortBy(_.doc_id)).forall {
      case (a, b) => a == b || (a.doc_id == b.doc_id && a.features.sameElements(b.features))
    })
  }

  // --- real javax.imageio decode path -------------------------------

  /** Deterministic test image: pixel (x, y) of doc d is a pure
    * function of (d, x, y), covering the full 0-255 range. */
  private def pixel(d: Long, x: Int, y: Int): Int = {
    val r = ((d * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((d * 17 + x * 3 + y * 5) % 256).toInt
    val b = ((d * 11 + x * 19 + y * 23) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def makeImage(d: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(d, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos))
    bos.toByteArray
  }

  /** Independent expectation: stripe-mean luminance computed straight
    * from the pixel function, never through ImageIO. */
  private def expectedFeatures(d: Long, w: Int, h: Int): Array[Float] = {
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    val stripe = math.max(h / 8, 1)
    for (y <- 0 until h; x <- 0 until w) {
      val s = math.min(y / stripe, 7)
      val p = pixel(d, x, y)
      sums(s) += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0
      counts(s) += 1
    }
    Array.tabulate(8)(j => if (counts(j) > 0) (sums(j) / counts(j)).toFloat else 0f)
  }

  test("decodeBatched: real PNG payloads decode to exact dims, channels, pixel stats") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", makeImage(1L, 40, 24, "png")),
      Multimodal.MediaRow(2L, "image/png", makeImage(2L, 17, 9, "png")), // h > 8 but not divisible
      Multimodal.MediaRow(3L, "image/png", makeImage(3L, 5, 3, "png"))) // h < 8 stripes
    val out = Multimodal.decodeBatched(spark.createDataset(rows), batchSize = 2)
      .collect().map(d => d.doc_id -> d).toMap
    val dims = Map(1L -> (40, 24), 2L -> (17, 9), 3L -> (5, 3))
    dims.foreach { case (id, (w, h)) =>
      val d = out(id)
      assert(d.width === w && d.height === h)
      assert(d.channels === 3)
      val exp = expectedFeatures(id, w, h)
      // PNG is lossless: stripe means must match to float rounding
      d.features.zip(exp).foreach { case (a, e) => assert(math.abs(a - e) < 1e-3, s"doc $id") }
    }
  }

  test("decodeBatched: real JPEG decodes true dims; lossy pixels stay close") {
    import spark.implicits._
    val rows = Seq(Multimodal.MediaRow(7L, "image/jpeg", makeImage(7L, 32, 32, "jpg")))
    val d = Multimodal.decodeBatched(spark.createDataset(rows)).collect().head
    assert(d.width === 32 && d.height === 32 && d.channels === 3)
    val exp = expectedFeatures(7L, 32, 32)
    d.features.zip(exp).foreach { case (a, e) => assert(math.abs(a - e) < 32f) }
  }

  test("decodeBatched: undecodable image payloads fall back to the stub") {
    import spark.implicits._
    val text = "not actually a jpeg".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(9L, "image/jpeg", text),
      Multimodal.MediaRow(10L, "image/png", Array.emptyByteArray))
    val out = Multimodal.decodeBatched(spark.createDataset(rows))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(9L).width === text.length % 317 + 16) // stub geometry
    assert(out(10L).n_bytes === 0)
  }

  // --- real javax.sound.sampled decode path -------------------------

  /** Deterministic test WAV: 16-bit signed PCM frames from an explicit
    * per-frame sample function, written through AudioSystem so the
    * header is a real RIFF/WAVE container. */
  private def makeWav(samples: Array[Short], rate: Float, channels: Int,
                      bits: Int = 16): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * bits / 8)
    var i = 0
    while (i < samples.length) {
      if (bits == 16) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      } else { // 8-bit WAV is unsigned PCM by convention
        bytes(i) = ((samples(i) / 256) + 128).toByte
      }
      i += 1
    }
    val enc = if (bits == 16) AudioFormat.Encoding.PCM_SIGNED
              else AudioFormat.Encoding.PCM_UNSIGNED
    val fmt = new AudioFormat(enc, rate, bits, channels,
      channels * bits / 8, rate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeBatched: real WAV decodes true rate/channels/frames and exact stripe RMS") {
    import spark.implicits._
    // mono square wave at constant |amplitude| A: every mono-mixed
    // frame contributes A², so each stripe's RMS is exactly A/32768
    val a = 8192
    val mono = Array.tabulate(800)(i => (if (i % 2 == 0) a else -a).toShort)
    // stereo: L = +A, R = −A mono-mixes to 0; second half L = R = A/2
    val stereo = Array.tabulate(1200) { i =>
      val f = i / 2
      if (f < 300) { if (i % 2 == 0) a.toShort else (-a).toShort }
      else (a / 2).toShort
    }
    val rows = Seq(
      Multimodal.MediaRow(21L, "audio/wav", makeWav(mono, 8000f, 1)),
      Multimodal.MediaRow(22L, "audio/wav", makeWav(stereo, 44100f, 2)))
    val out = Multimodal.decodeBatched(spark.createDataset(rows))
      .collect().map(d => d.doc_id -> d).toMap
    val m = out(21L)
    assert(m.width === 800 && m.height === 8000 && m.channels === 1)
    m.features.foreach(f => assert(math.abs(f - a / 32768f) < 1e-6f, s"mono RMS $f"))
    val s = out(22L)
    assert(s.width === 600 && s.height === 44100 && s.channels === 2)
    // frames 0-299 (stripes 0-3) mix to 0; frames 300-599 to A/2
    s.features.take(4).foreach(f => assert(f === 0f, s"cancelling stereo RMS $f"))
    s.features.drop(4).foreach(f =>
      assert(math.abs(f - a / 2f / 32768f) < 1e-6f, s"steady stereo RMS $f"))
  }

  test("decodeBatched: 8-bit unsigned WAV converts through the JDK to the same stats") {
    import spark.implicits._
    // constant +A square at 8-bit resolution: A = 8192 → byte 32 above
    // center → reconstructed 16-bit magnitude exactly 32·256 = 8192
    val a = 8192
    val samples = Array.tabulate(400)(i => (if (i % 2 == 0) a else -a).toShort)
    val rows = Seq(Multimodal.MediaRow(23L, "audio/wav", makeWav(samples, 16000f, 1, bits = 8)))
    val d = Multimodal.decodeBatched(spark.createDataset(rows)).collect().head
    assert(d.width === 400 && d.height === 16000 && d.channels === 1)
    d.features.foreach(f => assert(math.abs(f - a / 32768f) < 1e-2f, s"8-bit RMS $f"))
  }

  test("decodeBatched: undecodable audio payloads fall back to the stub") {
    import spark.implicits._
    val text = "not actually a wav".getBytes("UTF-8")
    val rows = Seq(Multimodal.MediaRow(24L, "audio/wav", text))
    val d = Multimodal.decodeBatched(spark.createDataset(rows)).collect().head
    assert(d.width === text.length % 317 + 16) // stub geometry
  }

  test("sampleFrames: only video payloads, stride-spaced frame numbers") {
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_no") % 4 == 0))
    val videoIds = media.filter(_.mime == "video/mp4").collect().map(_.doc_id).toSet
    assert(frames.map(_.getAs[Long]("doc_id")).toSet.subsetOf(videoIds))
  }

  test("keyFrames: scene changes flag, steady scenes don't, first frame always keeps") {
    import spark.implicits._
    // three "scenes": 4 chunks of byte 10, 4 of byte 200, 4 of byte 12
    // → keyframes at frames 0 (first), 4 (10→200 jump) and 8 (200→12)
    val payload = (Array.fill(256)(10.toByte) ++ Array.fill(256)(200.toByte)
      ++ Array.fill(256)(12.toByte))
    val rows = Seq(Multimodal.MediaRow(1L, "video/mp4", payload))
    val got = Multimodal.keyFrames(spark.createDataset(rows), stride = 1)
      .collect()
      .map(r => r.getAs[Int]("frame_no") -> r.getAs[Boolean]("is_keyframe"))
      .toMap
    assert(got.size === 12, "stride 1 over 768 bytes = 12 frames")
    assert(got.filter(_._2).keySet === Set(0, 4, 8))
    // wider stride still lands on the scene boundaries it samples
    val sampled = Multimodal.keyFrames(spark.createDataset(rows), stride = 4)
      .collect()
      .map(r => r.getAs[Int]("frame_no") -> r.getAs[Boolean]("is_keyframe"))
      .toMap
    assert(sampled.keySet === Set(0, 4, 8))
    assert(sampled.values.forall(identity), "every sampled frame starts a scene here")
  }

  test("Motion-JPEG: real frames split at SOI boundaries, decode, and scene-cut on real pixels") {
    import spark.implicits._
    // a real MJPEG stream: 12 concatenated JPEG frames of constant
    // gray — 6 dark (40), then 6 bright (200). The scene cut must be
    // detected from DECODED pixel luminance, not payload bytes.
    def jpegFrame(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", baos), "JDK must encode JPEG")
      baos.toByteArray
    }
    val payload = (Seq.fill(6)(jpegFrame(40)) ++ Seq.fill(6)(jpegFrame(200)))
      .reduce(_ ++ _)
    val rows = Seq(Multimodal.MediaRow(1L, "video/x-motion-jpeg", payload))

    // frame split: 12 real frames, each independently ImageIO-decodable
    val frames = Multimodal.sampleFrames(spark.createDataset(rows), stride = 1)
      .collect().sortBy(_.getAs[Int]("frame_no"))
    assert(frames.length === 12)
    frames.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      assert(img != null && img.getWidth === 16 && img.getHeight === 16,
        s"frame ${r.getAs[Int]("frame_no")} must be a standalone decodable JPEG")
    }

    // scene-change detection on real decoded means: keyframes exactly
    // at frame 0 (first) and frame 6 (the 40→200 luminance jump);
    // identical in-scene frames encode identically → zero diff
    val kf = Multimodal.keyFrames(spark.createDataset(rows), stride = 1)
      .collect()
      .map(r => r.getAs[Int]("frame_no") ->
        (r.getAs[Boolean]("is_keyframe"), r.getAs[Double]("mean_byte"))).toMap
    assert(kf.size === 12)
    assert(kf.filter(_._2._1).keySet === Set(0, 6))
    // the statistic is real luminance (≈ the planted grays), which no
    // byte-level mean of compressed JPEG data would reproduce
    assert(math.abs(kf(0)._2 - 40.0) < 6.0, s"dark-scene mean ${kf(0)._2}")
    assert(math.abs(kf(6)._2 - 200.0) < 6.0, s"bright-scene mean ${kf(6)._2}")

    // the batched decoder takes the real path too: true dimensions
    // from the first frame, not the stub's payload-size geometry
    val d = Multimodal.decodeBatched(spark.createDataset(rows)).collect().head
    assert(d.width === 16 && d.height === 16)
    // temporal features: dark stripes ≈ 40, bright stripes ≈ 200
    assert(math.abs(d.features(0) - 40.0) < 6.0)
    assert(math.abs(d.features(7) - 200.0) < 6.0)

    // an unsniffable payload under a video mime still takes the stub
    // chunker — the documented fallback, not an error
    val stubRows = Seq(Multimodal.MediaRow(2L, "video/mp4",
      Array.fill(128)(7.toByte)))
    val stubFrames = Multimodal.sampleFrames(spark.createDataset(stubRows), stride = 1)
      .collect()
    assert(stubFrames.length === 2, "128 bytes = two 64-byte stub chunks")
  }

  test("aHash: identical images collide, perturbed images stay near, distinct images part") {
    import spark.implicits._
    // a structured image (left-dark / right-light gradient), its exact
    // copy, a lightly perturbed copy (one grid cell brightened), and
    // its inverse
    val (w, h) = (64, 48)
    def gradient(invert: Boolean, bumpCell: Option[(Int, Int)]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val base = x * 255 / (w - 1)
        val v0 = if (invert) 255 - base else base
        val bumped = bumpCell.exists { case (gx, gy) =>
          x * 8 / w == gx && y * 8 / h == gy }
        val v = if (bumped) 255 else v0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(0L, "image/png", gradient(invert = false, None)),
      Multimodal.MediaRow(1L, "image/png", gradient(invert = false, None)),
      Multimodal.MediaRow(2L, "image/png", gradient(invert = false, Some((0, 0)))),
      Multimodal.MediaRow(3L, "image/png", gradient(invert = true, None)))
    val hashes = Multimodal.aHash(spark.createDataset(rows))
      .collect().map(p => p.doc_id -> p.phash).toMap
    assert(hashes.values.forall(ph => ph.length == 64 && ph.forall(c => c == '0' || c == '1')))
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    // exact copy: identical hash
    assert(hashes(0L) === hashes(1L))
    // one brightened grid cell flips few bits
    assert(hamming(hashes(0L), hashes(2L)) <= 4,
      s"perturbation too destructive: ${hamming(hashes(0L), hashes(2L))}")
    assert(hashes(0L) !== hashes(2L), "the brightened dark-side cell must flip its bit")
    // inverted gradient flips (nearly) every informative bit
    assert(hamming(hashes(0L), hashes(3L)) >= 32,
      s"inverse should be far: ${hamming(hashes(0L), hashes(3L))}")
    // sanity: the full hash from first principles — the gradient is a
    // function of x only, so the hash is one 8-bit row pattern
    // repeated; same Int-truncating pixel formula, same exact integer
    // cross-multiply (per-row h factor cancels)
    val vals = (0 until w).map(x => 3L * (x * 255 / (w - 1)))
    val (totalSum, totalCnt) = (vals.sum, w.toLong)
    val expectedRow = (0 until 8).map { gx =>
      val xs = (0 until w).filter(x => x * 8 / w == gx)
      val (cs, cc) = (xs.map(vals).sum, xs.size.toLong)
      if (cs * totalCnt > totalSum * cc) '1' else '0'
    }.mkString
    assert(hashes(0L) === expectedRow * 8)
  }

  test("phash banded near-dup: the native popcount hamming (r15) equals a " +
    "per-char count on planted signatures, gate at <= 6 exact") {
    import spark.implicits._
    // planted 64-char bit strings; bands are substr(1+16b, 16), so
    // differing only inside band 2 keeps bands 0/1/3 as exact-match
    // candidates while the hamming distance is fully controlled
    def bits(ones: Set[Int]): String =
      (0 until 64).map(i => if (ones(i)) '1' else '0').mkString
    val base = Set(1, 5, 62)
    val h0 = bits(base)
    val h1 = bits(base ++ Set(33, 34, 40, 41))            // hamming 4 from h0
    val h2 = bits(base ++ Set(32, 35, 36, 37, 38, 39, 42, 43)) // hamming 8
    Seq((0L, h0), (1L, h1), (2L, h2)).toDF("doc_id", "phash")
      .createOrReplaceTempView("phash_tbl")
    val got = spark.sql(SqlOps.phashNear(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    // independent per-char count over every pair + the <= 6 gate
    def ham(a: String, b: String): Long =
      a.zip(b).count { case (x, y) => x != y }.toLong
    val all = Seq((0L, h0), (1L, h1), (2L, h2))
    val want = (for {
      (ia, pa) <- all; (ib, pb) <- all if ia < ib
      d = ham(pa, pb) if d <= 6
    } yield (ia, ib, d)).toSet
    assert(want === Set((0L, 1L, 4L)), "fixture self-check: exactly the near pair")
    assert(got === want,
      s"popcount hamming must equal the per-char count + gate: got $got")
    spark.catalog.dropTempView("phash_tbl")
  }
}
