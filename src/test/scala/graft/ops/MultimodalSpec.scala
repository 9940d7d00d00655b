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

  test("sampleFrames: only video payloads, stride-spaced frame numbers") {
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_no") % 4 == 0))
    val videoIds = media.filter(_.mime == "video/mp4").collect().map(_.doc_id).toSet
    assert(frames.map(_.getAs[Long]("doc_id")).toSet.subsetOf(videoIds))
  }
}
