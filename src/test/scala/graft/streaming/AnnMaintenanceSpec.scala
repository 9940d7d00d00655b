package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming IVF maintenance: frozen centroids, per-batch delta
  * assignment, one atomic state artifact (posting list + sufficient
  * statistics). Expectations are computed from first principles in
  * plain Scala — the micro-oracle pattern. */
class AnnMaintenanceSpec extends SparkSpec {

  private def q(x: Float): Long = math.floor(x.toDouble * 1.0e6 + 0.5).toLong

  // two frozen centroids in µ-quantized units: cell 0 ≈ e1, cell 1 ≈ e2
  private def centroids = {
    import spark.implicits._
    Seq((0, 0L, 1000000L), (0, 1L, 0L), (0, 2L, 0L), (0, 3L, 0L),
        (1, 0L, 0L), (1, 1L, 1000000L), (1, 2L, 0L), (1, 3L, 0L))
      .toDF("label", "pos", "qc")
  }

  private val b1: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(0.9f, 0.1f, 0f, 0f),   // → cell 0
    2L -> Seq(0.1f, 1.1f, 0f, 0f),   // → cell 1
    3L -> Seq(0.5f, 0.5f, 0.5f))     // wrong dimension → skipped
  private val b2: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(0.9f, 0.1f, 0f, 0f),   // replay of an indexed vector
    4L -> Seq(0.8f, 0.2f, 0f, 0f))   // → cell 0

  /** Independent expectation over the distinct well-dimensioned
    * vectors of all delivered batches. */
  private def expected(batches: Seq[Seq[(Long, Seq[Float])]])
      : (Map[Long, Int], Map[(Int, Long), (Long, Long)]) = {
    val cents = Map(
      0 -> Array(1000000L, 0L, 0L, 0L),
      1 -> Array(0L, 1000000L, 0L, 0L))
    val vecs = batches.flatten.distinct.filter(_._2.length == 4)
      .groupBy(_._1).map { case (id, vs) => id -> vs.head._2 }
    val memb = vecs.map { case (id, v) =>
      val qs = v.map(q).toArray
      id -> cents.keys.toSeq.sortBy { l =>
        ((0 until 4).map(p => { val d = qs(p) - cents(l)(p); d * d }).sum, l)
      }.head
    }
    val stats = vecs.toSeq.flatMap { case (id, v) =>
      (0 until 4).map(p => (memb(id), p.toLong) -> q(v(p)))
    }.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.map(_._2).sum, xs.size.toLong)
    }
    (memb, stats)
  }

  private def readState(dir: String): (Map[Long, Int], Map[(Int, Long), (Long, Long)]) = {
    val st = spark.read.parquet(dir)
    val memb = st.filter(col("kind") === "member").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val stats = st.filter(col("kind") === "stat").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("pos")) ->
        (r.getAs[Long]("s"), r.getAs[Long]("n"))).toMap
    (memb, stats)
  }

  test("streaming IVF maintenance: membership, stats merge, and replay idempotence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_annm").toString
    val target = s"$dir/state"
    val cent = centroids
    val in = MemoryStream[(Long, Seq[Float])]
    val df = in.toDF().toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
    val qy = StreamingOps.annMaintenance(spark, df, cent, target, s"$dir/ckpt").start()
    in.addData(b1: _*)
    qy.processAllAvailable()
    in.addData(b2: _*)
    qy.processAllAvailable()
    qy.stop()

    val (gotMemb, gotStats) = readState(target)
    val (expMemb, expStats) = expected(Seq(b1, b2))
    assert(gotMemb === expMemb)
    assert(gotStats === expStats)
    assert(gotMemb === Map(1L -> 0, 2L -> 1, 4L -> 0)) // wrong-dim 3 skipped
    assert(gotStats((0, 0L)) === (q(0.9f) + q(0.8f), 2L))

    // at-least-once: redeliver batch 1 straight into the batch body —
    // every vector is already a member, so nothing changes
    StreamingOps.annMaintenanceBatch(spark,
      b1.toDF("vec_id", "embedding")
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding"),
      cent, target)
    assert(readState(target) === (gotMemb, gotStats))

    // drift report: cell 0's mean pulled to ~850k µ vs the frozen 1000k
    val drift = StreamingOps.ivfDriftReport(spark.read.parquet(target), cent)
      .collect().map(r => r.getAs[Int]("cell") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("max_drift_mu"),
          r.getAs[Int]("retrain_flag"))).toMap
    val c0mean = math.floor((q(0.9f) + q(0.8f)).toDouble / 2 + 0.5).toLong
    assert(drift(0) === (2L, 1000000L - c0mean, 1))
    assert(drift(1)._1 === 1L)
  }
}
