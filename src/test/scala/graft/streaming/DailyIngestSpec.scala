package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end rehearsal of the composed daily-ingest pipeline
  * (quota gate → minhash band index → incremental clusters →
  * survivors): batch-path parity, kill-and-restart via
  * Trigger.AvailableNow drains, mid-pipeline crash self-healing, and
  * replay idempotence. */
class DailyIngestSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // (doc_id, source, text). Identical texts guarantee identical minhash
  // signatures → band collisions; the reference implementation below
  // uses the SAME signature function, so parity holds regardless of
  // which near-collisions LSH happens to find.
  private val tA = "alpha beta gamma delta epsilon zeta"
  private val tB = "one two three four five six seven"
  private val tC = "red green blue yellow purple orange pink"
  private val tD = "cat dog fish bird mouse horse goat"
  private val day1 = Seq(
    (1L, "A", tA), (2L, "A", tA), // exact dup pair inside one day
    (3L, "A", tB), (5L, "A", tD),
    (7L, "A", "late arrival for a full source yes"), // A at quota 4 → rejected
    (4L, "B", tC),
    (6L, "B", "tiny doc")) // < 3 words → no shingles → sentinel band
  private val day2 = Seq(
    (1L, "A", tA), // redelivery of an admitted doc → no-op
    (8L, "B", tC), // dup of day-1 doc 4 → new-old edge
    (11L, "B", "completely fresh text written on day two"))
  private val day3 = Seq(
    (10L, "B", tC), // dup of 4 AND 8 → joins the existing multi-doc cluster
    (12L, "C", tB)) // new source; dup of A's doc 3 ACROSS sources

  private val quota = 4

  /** Independent reference: sequential per-day quota replay, then the
    * BATCH dedup shape over all admitted docs at once — full band
    * self-join, from-scratch CC, min-per-cluster survivors. */
  private def referenceSurvivors(days: Seq[Seq[(Long, String, String)]]): Set[Long] = {
    import spark.implicits._
    val admitted = scala.collection.mutable.Map.empty[String, Vector[Long]]
    days.foreach { day =>
      day.groupBy(_._2).toSeq.foreach { case (src, docs) =>
        val have = admitted.getOrElse(src, Vector.empty)
        val fresh = docs.map(_._1).distinct.sorted
          .filterNot(have.contains).take(math.max(0, quota - have.size))
        admitted(src) = have ++ fresh
      }
    }
    val admittedIds = admitted.values.flatten.toSet
    val docs = days.flatten.distinct.filter(d => admittedIds(d._1))
      .toDF("doc_id", "source", "text").dropDuplicates("doc_id")
    val bands = StreamingOps.bandRowsOf(docs).filter(col("band") =!= -1)
    val edges = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val cc = graft.ops.Cluster.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    admittedIds.filter(id => cc.get(id).forall(_ == id))
  }

  private def readIds(dir: String): Set[Long] =
    spark.read.parquet(dir).collect().map(_.getAs[Long]("doc_id")).toSet

  test("daily ingest: three AvailableNow drains (restart each day) match the batch path") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dir = tmp("graft_ingest")
    val landing = s"$dir/landing"
    val root = s"$dir/state"

    def land(day: Seq[(Long, String, String)]): Unit =
      day.toDF("doc_id", "source", "text").write.mode("append").parquet(landing)

    // each day is its own query over the SAME checkpoint — the stream
    // is killed and restarted between days, and only the new files are
    // drained on each restart
    def drain(): Unit = {
      val schema = spark.read.parquet(landing).schema
      val stream = spark.readStream.schema(schema).parquet(landing)
      val q = StreamingOps.dailyIngest(spark, stream, quota, root, s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    land(day1); drain()
    // day-1 state: A admits 1,2,3,5 (7 rejected), B admits 4,6;
    // dup pair (1,2) collapses, sentinel doc 6 survives as a singleton
    assert(readIds(s"$root/survivors") === Set(1L, 3L, 5L, 4L, 6L))

    land(day2); drain()
    land(day3); drain()

    val expected = referenceSurvivors(Seq(day1, day2, day3))
    assert(readIds(s"$root/survivors") === expected)
    // the cross-day exact-dup chain 4–8–10 collapsed to its minimum
    assert(Set(8L, 10L).intersect(readIds(s"$root/survivors")).isEmpty)
    assert(readIds(s"$root/survivors").contains(4L))
    // cross-source dup 12 (= text of 3) collapsed too
    assert(!readIds(s"$root/survivors").contains(12L))
    // the admitted artifact respects the lifetime quota per source
    val perSource = spark.read.parquet(s"$root/admitted")
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(perSource.values.forall(_ <= quota))
    assert(perSource("A") === quota.toLong) // 7 was genuinely rejected

    // the cluster map is row-identical to a from-scratch batch build:
    // full CC over the union edges, plus singleton self-rows
    val admitted = spark.read.parquet(s"$root/admitted").select("doc_id")
    val docs = Seq(day1, day2, day3).flatten.distinct
      .toDF("doc_id", "source", "text")
      .join(admitted, Seq("doc_id"), "left_semi").dropDuplicates("doc_id")
    val bands = StreamingOps.bandRowsOf(docs).filter(col("band") =!= -1)
    val edges = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val cc = graft.ops.Cluster.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotMap = spark.read.parquet(s"$root/clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val admittedIds = admitted.collect().map(_.getLong(0)).toSet
    val expectedMap = admittedIds.map(id => id -> cc.getOrElse(id, id)).toMap
    assert(gotMap === expectedMap)
  }

  test("daily ingest: a crash between stage publishes self-heals on redelivery") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val cleanRoot = tmp("graft_ingest_clean")
    val crashRoot = tmp("graft_ingest_crash")
    val b1 = day1.toDF("doc_id", "source", "text")
    val b2 = day2.toDF("doc_id", "source", "text")

    // clean run: two full batches
    StreamingOps.dailyIngestBatch(spark, b1, quota, cleanRoot)
    StreamingOps.dailyIngestBatch(spark, b2, quota, cleanRoot)

    // crashed run: batch 1 completes; batch 2 "dies" after the admit
    // and sign publishes, BEFORE clustering — then the batch is
    // redelivered and the full pipeline runs again
    StreamingOps.dailyIngestBatch(spark, b1, quota, crashRoot)
    StreamingOps.ingestAdmit(spark, b2, quota, crashRoot)
    StreamingOps.ingestSign(spark, b2, crashRoot)
    StreamingOps.dailyIngestBatch(spark, b2, quota, crashRoot) // the retry

    for (art <- Seq("admitted", "bands", "clusters", "survivors")) {
      val clean = spark.read.parquet(s"$cleanRoot/$art").collect().map(_.toSeq).toSet
      val crashed = spark.read.parquet(s"$crashRoot/$art").collect().map(_.toSeq).toSet
      assert(crashed === clean, s"artifact $art diverged after mid-pipeline crash")
    }
  }

  test("daily ingest: replaying an already-processed day changes nothing") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_ingest_replay")
    val b1 = day1.toDF("doc_id", "source", "text")
    val b2 = day2.toDF("doc_id", "source", "text")
    StreamingOps.dailyIngestBatch(spark, b1, quota, root)
    StreamingOps.dailyIngestBatch(spark, b2, quota, root)
    val before = Seq("admitted", "bands", "clusters", "survivors")
      .map(a => a -> spark.read.parquet(s"$root/$a").collect().map(_.toSeq).toSet).toMap
    // at-least-once: the whole of day 1 arrives again
    StreamingOps.dailyIngestBatch(spark, b1, quota, root)
    before.foreach { case (art, want) =>
      val got = spark.read.parquet(s"$root/$art").collect().map(_.toSeq).toSet
      assert(got === want, s"artifact $art changed under replay")
    }
  }
}
