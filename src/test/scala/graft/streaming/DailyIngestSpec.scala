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

  // --- the MONITORED drain: gate → dedup → IVF maintenance → reports --

  /** Deterministic per-doc embedding near one of two planted centers:
    * even ids hug center 0 (low values), odd ids center 1 (high), with
    * a small id-dependent wiggle so drift statistics are non-trivial. */
  private def emb(id: Long): Array[Float] = {
    val base = if (id % 2 == 0) 0.1f else 0.9f
    Array.tabulate(4)(j => base + ((id * 7 + j * 3) % 5).toFloat / 100f)
  }

  /** The frozen coarse quantizer: centroid 0 at 0.1⁴, centroid 1 at
    * 0.9⁴, µ-quantized int64 — the (label, pos, qc) contract of
    * annMaintenanceBatch. */
  private def centroids: DataFrame = {
    import spark.implicits._
    (for (l <- Seq(0L, 1L); p <- 0L to 3L)
      yield (l, p, if (l == 0) 100000L else 900000L)).toDF("label", "pos", "qc")
  }

  private def withEmb(day: Seq[(Long, String, String)]): Seq[(Long, String, String, Array[Float])] =
    day.map { case (id, src, text) => (id, src, text, emb(id)) }

  private def artifacts(root: String): Map[String, Set[Seq[Any]]] =
    Seq("admitted", "bands", "clusters", "survivors", "manifest", "release",
        "card", "rejects", "ivf", "history", "drift", "ewma", "metrics", "pii",
        "oov", "vocab", "release_log")
      .map(a => a -> spark.read.parquet(s"$root/$a").collect().map(_.toSeq).toSet)
      .toMap

  test("monitored ingest: three restart drains — dedup parity, index membership, live reports") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dir = tmp("graft_mingest")
    val landing = s"$dir/landing"
    val root = s"$dir/state"

    def land(day: Seq[(Long, String, String)]): Unit =
      withEmb(day).toDF("doc_id", "source", "text", "embedding")
        .write.mode("append").parquet(landing)

    def drain(): Unit = {
      val schema = spark.read.parquet(landing).schema
      val stream = spark.readStream.schema(schema).parquet(landing)
      val q = StreamingOps.dailyIngestMonitored(
          spark, stream, quota, centroids, root, s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    land(day1); drain()
    land(day2); drain()
    land(day3); drain()

    // the dedup semantics are untouched by the added stages
    assert(readIds(s"$root/survivors") === referenceSurvivors(Seq(day1, day2, day3)))

    // the IVF index holds exactly the admitted ids, each in its
    // nearest planted cell (even → 0, odd → 1 by construction)
    val admittedIds = spark.read.parquet(s"$root/admitted")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val members = spark.read.parquet(s"$root/ivf")
      .filter(col("kind") === "member").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(members.keySet === admittedIds)
    members.foreach { case (id, cell) => assert(cell === id % 2, s"doc $id") }

    // drift report = the pure read-side function recomputed
    val wantDrift = StreamingOps.ivfDriftReport(
        spark.read.parquet(s"$root/ivf"), centroids)
      .collect().map(_.toSeq).toSet
    assert(spark.read.parquet(s"$root/drift").collect().map(_.toSeq).toSet === wantDrift)
    // the planted wiggle is ≤ 0.04 ⇒ ≤ 40000 µ mean drift; with the
    // retrain bar at 1000 µ both cells flag (statistics are moving)
    assert(spark.read.parquet(s"$root/drift").collect()
      .forall(_.getAs[Int]("retrain_flag") === 1))

    // history: one row per drain, lifetime admitted counts
    // (day 1: A admits 4 of 5, B 2 → 6; day 2: B admits 8, 11 → 8;
    //  day 3: B is AT quota so 10 is rejected, C admits 12 → 9)
    val hist = spark.read.parquet(s"$root/history").collect()
      .map(r => r.getAs[Long]("batch_seq") -> r.getAs[Long]("n_admitted")).toMap
    assert(hist === Map(0L -> 6L, 1L -> 8L, 2L -> 9L))

    // EWMA gate: forecast equals the hand-rolled weighted mean over
    // per-drain deltas (6, 2, 1); no anomaly on a calm feed
    val ew = spark.read.parquet(s"$root/ewma").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (Option(r.getAs[java.lang.Double]("forecast")), r.getAs[Int]("is_anomaly"))).toMap
    assert(ew(0L)._1.isEmpty) // nothing to forecast the first drain
    assert(math.abs(ew(1L)._1.get - 6.0) < 1e-9) // EWMA of (6) is 6
    // EWMA of (6, 2) with α=0.3: (0.3·2 + 0.21·6) / 0.51
    assert(math.abs(ew(2L)._1.get - (0.3 * 2 + 0.21 * 6) / 0.51) < 1e-9)
    assert(ew.values.forall(_._2 === 0))

    // health metrics: quota pressure, survivor count, cluster-size
    // histogram and cell occupancy all present and consistent
    val metrics = spark.read.parquet(s"$root/metrics").collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    assert(metrics("admitted:A") === quota.toLong)
    assert(metrics("survivors") === readIds(s"$root/survivors").size.toLong)
    assert(metrics("ivf_cell:0") + metrics("ivf_cell:1") === admittedIds.size.toLong)
    // dup chains among ADMITTED docs: {1,2}, {4,8} (10 never admitted),
    // {3,12} → three size-2 clusters; 5, 6, 11 stay singletons
    assert(metrics("cluster_size:2") === 3L)
    assert(metrics("cluster_size:1") === 3L)
    assert(!metrics.contains("cluster_size:3"))

    // PII leak monitor: one row per drain, all-clean corpus → zero
    // counts, no flag
    val pii = spark.read.parquet(s"$root/pii").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (Seq("n_card", "n_email", "n_ipv4", "n_phone").map(r.getAs[Long]).sum,
          r.getAs[Int]("flag"))).toMap
    assert(pii === Map(0L -> (0L, 0), 1L -> (0L, 0), 2L -> (0L, 0)))
  }

  test("monitored ingest: a leaking batch flags the PII monitor, first write wins on replay") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_pii")
    val leaky = Seq(
      (21L, "A", "ping admin@example.org from 10.0.0.7 about the rollout"),
      (22L, "A", "a perfectly clean line of prose"))
    val b1 = withEmb(leaky).toDF("doc_id", "source", "text", "embedding")
    val b2 = withEmb(Seq((23L, "B", "nothing sensitive here either")))
      .toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    def piiRows() = spark.read.parquet(s"$root/pii").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_ipv4"),
          r.getAs[Long]("n_card"), r.getAs[Long]("n_phone"),
          r.getAs[Int]("flag"))).toMap
    assert(piiRows() === Map(0L -> (1L, 1L, 0L, 0L, 1)))
    // replay of the same batch: the recorded row stays (first write wins)
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    assert(piiRows() === Map(0L -> (1L, 1L, 0L, 0L, 1)))
    // a clean follow-up batch records its own zero row, unflagged
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)
    assert(piiRows() === Map(0L -> (1L, 1L, 0L, 0L, 1), 1L -> (0L, 0L, 0L, 0L, 0)))
  }

  test("monitored ingest: streaming manifest union == batch manifest over the " +
    "replayed corpus; release = manifest ∩ survivors") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_manifest")
    // texts sized for the corpus-filter gate (quality ≥ 0.4 needs
    // ~30 words with long content words and a low stopword ratio,
    // plus en-stopword hits for lang 'en') — the other tests'
    // nonsense fixtures would make every manifest empty, a vacuous
    // pass; the nonEmpty assert below guards that
    val e1 = "the quantum processor executed seventeen benchmark workloads and " +
      "delivered consistent throughput across distributed clusters while " +
      "maintaining thermal stability under sustained production traffic in " +
      "the experimental datacenter during extended validation periods"
    val e2 = "the research consortium published comprehensive findings about " +
      "glacier dynamics and sediment transport in mountainous watersheds " +
      "demonstrating measurable correlations between seasonal temperature " +
      "gradients and downstream aquifer recharge patterns across decades"
    val e3 = "the orchestra rehearsed intricate passages from contemporary " +
      "compositions and refined ensemble balance through deliberate " +
      "sectional practice while guest conductors introduced interpretive " +
      "approaches rooted in historical performance scholarship"
    val junk = "zzz qqq xxx www vvv" // admitted, but fails the quality gate
    val dayA = Seq((31L, "A", e1), (32L, "A", e1), // exact dup inside day A
      (33L, "A", e2), (34L, "A", junk))
    val dayB = Seq((35L, "B", e3),
      (36L, "B", e1)) // CROSS-batch exact dup of 31 → text_md5 gate
    val b1 = withEmb(dayA).toDF("doc_id", "source", "text", "embedding")
    val b2 = withEmb(dayB).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    // replay of day A before day B: first-write-wins, no duplicate rows
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)

    val cols = Seq("doc_id", "lang_guess", "quality", "n_tokens", "shard",
      "content_hash")
    val got = spark.read.parquet(s"$root/manifest")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet

    // batch-manifest ∘ replay: the SAME rendered SQL over the corpus
    // the ingest admitted, in one batch
    val admittedIds = readIds(s"$root/admitted")
    (dayA ++ dayB).distinct.filter(d => admittedIds(d._1))
      .toDF("doc_id", "source", "text").dropDuplicates("doc_id")
      .createOrReplaceTempView("__manifest_replay")
    val want = spark.sql(graft.ops.SqlOps.releaseManifest(
        graft.ops.SparkDialect, from = "__manifest_replay"))
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    spark.catalog.dropTempView("__manifest_replay")
    assert(want.nonEmpty, "fixture texts must pass the corpus filter")
    assert(got === want)

    val manifestIds = got.map(_.head.asInstanceOf[Long])
    // the junk doc was admitted but the quality gate keeps it out
    assert(admittedIds.contains(34L) && !manifestIds.contains(34L))
    // exact dups collapse to the min doc_id, within AND across batches
    assert(manifestIds.intersect(Set(31L, 32L, 36L)) === Set(31L))

    // release = manifest ∩ survivors, recomputed per batch
    val survivors = readIds(s"$root/survivors")
    val wantRelease = got.filter(r => survivors(r.head.asInstanceOf[Long]))
    val gotRelease = spark.read.parquet(s"$root/release")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(gotRelease === wantRelease)

    // full replay of day B: every manifest/release row unchanged
    val before = artifacts(root)
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)
    assert(artifacts(root) === before)
  }

  test("monitored ingest: card additive rollup == batch card over the replayed " +
    "corpus; group-grain rows recomputed per batch") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_card")
    // the manifest test's fixture shape: an in-batch exact dup (31/32),
    // a CROSS-batch dup (36 of 31 — the group a per-slice delta cannot
    // see), a quality-gate failure (34), two sources
    val e1 = "the quantum processor executed seventeen benchmark workloads and " +
      "delivered consistent throughput across distributed clusters while " +
      "maintaining thermal stability under sustained production traffic in " +
      "the experimental datacenter during extended validation periods"
    val e2 = "the research consortium published comprehensive findings about " +
      "glacier dynamics and sediment transport in mountainous watersheds " +
      "demonstrating measurable correlations between seasonal temperature " +
      "gradients and downstream aquifer recharge patterns across decades"
    val e3 = "the orchestra rehearsed intricate passages from contemporary " +
      "compositions and refined ensemble balance through deliberate " +
      "sectional practice while guest conductors introduced interpretive " +
      "approaches rooted in historical performance scholarship"
    val junk = "zzz qqq xxx www vvv"
    val dayA = Seq((31L, "A", e1), (32L, "A", e1), (33L, "A", e2), (34L, "A", junk))
    val dayB = Seq((35L, "B", e3), (36L, "B", e1))
    val b1 = withEmb(dayA).toDF("doc_id", "source", "text", "embedding")
    val b2 = withEmb(dayB).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)

    val card = spark.read.parquet(s"$root/card")
    val metricRows = card.filter(col("kind") === "metric").collect()
      .map(r => (r.getAs[Long]("batch_seq"), r.getAs[String]("metric"),
        r.getAs[Long]("value"), r.getAs[Boolean]("additive")))

    // ADDITIVE rollup: per-metric SUM over batches == the SAME rendered
    // SQL over the corpus the ingest admitted, in one batch (the
    // manifest test's replay rule, applied to the card)
    val admittedIds = readIds(s"$root/admitted")
    assert(admittedIds === Set(31L, 32L, 33L, 34L, 35L, 36L))
    (dayA ++ dayB).filter(d => admittedIds(d._1))
      .toDF("doc_id", "source", "text")
      .createOrReplaceTempView("__card_replay")
    val want = spark.sql(graft.ops.SqlOps.datasetCardAdditive(
        graft.ops.SparkDialect, from = "__card_replay"))
      .collect().map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    spark.catalog.dropTempView("__card_replay")
    val gotAdd = metricRows.filter(_._4).groupBy(_._2)
      .map { case (m, rs) => m -> rs.map(_._3).sum }
    assert(gotAdd === want)
    assert(want("docs") === 6L && want("lang_en_docs") >= 3L,
      "fixture must make the additive rows non-vacuous")

    // GROUP-GRAIN rows recomputed per batch: the latest batch_seq row
    // is current, and the cross-batch dup (36 joins 31/32's md5 group)
    // is visible ONLY in the batch-1 recompute — the exact information
    // a per-slice delta cannot carry
    val latest = metricRows.filter(r => !r._4 && r._1 == 1L)
      .map(r => r._2 -> r._3).toMap
    assert(latest("quality_pass_docs") ===
      spark.read.parquet(s"$root/manifest").count())
    assert(latest("exact_dup_groups") === 1L && latest("exact_dup_docs") === 3L)
    val after0 = metricRows.filter(r => !r._4 && r._1 == 0L)
      .map(r => r._2 -> r._3).toMap
    assert(after0("exact_dup_docs") === 2L,
      "day A alone sees only the in-batch dup pair")
    assert(latest("sources") === 2L &&
      latest("max_source_share_ppm") === 1000000L * 4L / 6L)

    // doc-kind membership rows cover exactly the admitted set
    val docRows = card.filter(col("kind") === "doc")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docRows === admittedIds)

    // full replay of day B: every card row unchanged (membership makes
    // the additive delta empty; first-write-wins keeps batch 1's rows)
    val before = spark.read.parquet(s"$root/card").collect().map(_.toSeq).toSet
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)
    assert(spark.read.parquet(s"$root/card").collect().map(_.toSeq).toSet === before)
  }

  test("monitored ingest: rejects dead-letter records every dropped doc with " +
    "its reason; replay adds nothing") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_rejects")
    val e1 = "the quantum processor executed seventeen benchmark workloads and " +
      "delivered consistent throughput across distributed clusters while " +
      "maintaining thermal stability under sustained production traffic in " +
      "the experimental datacenter during extended validation periods"
    val e2 = "the research consortium published comprehensive findings about " +
      "glacier dynamics and sediment transport in mountainous watersheds " +
      "demonstrating measurable correlations between seasonal temperature " +
      "gradients and downstream aquifer recharge patterns across decades"
    val e3 = "the orchestra rehearsed intricate passages from contemporary " +
      "compositions and refined ensemble balance through deliberate " +
      "sectional practice while guest conductors introduced interpretive " +
      "approaches rooted in historical performance scholarship"
    val junk = "zzz qqq xxx www vvv"
    val e4 = "the astronomical survey catalogued thousands of variable stars " +
      "and confirmed periodic luminosity fluctuations across overlapping " +
      "observation windows while automated telescopes maintained continuous " +
      "coverage during consecutive observation seasons throughout the decade"
    // day A fills source A's quota (4): 32 is an in-batch exact dup,
    // 34 fails the gate. Day B: 36 is a CROSS-batch dup of 31, 37
    // arrives after A's quota is exhausted, 38 has a NULL source
    // (unique gate-passing text — the heal fixture for day C).
    val dayA = Seq((31L, "A", e1), (32L, "A", e1), (33L, "A", e2), (34L, "A", junk))
    val dayB = Seq((35L, "B", e3), (36L, "B", e1), (37L, "A", e3),
      (38L, null.asInstanceOf[String], e4))
    val b1 = withEmb(dayA).toDF("doc_id", "source", "text", "embedding")
    val b2 = withEmb(dayB).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)

    def rejects() = spark.read.parquet(s"$root/rejects").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("batch_seq"), r.getAs[String]("reason")))).toMap
    val got = rejects()
    assert(got === Map(
      32L -> ((0L, "exact_dup")),      // in-batch dup of 31
      34L -> ((0L, "quality_gate")),   // junk text, whole group gated
      36L -> ((1L, "exact_dup")),      // cross-batch dup of 31
      37L -> ((1L, "quota")),          // source A already at 4
      38L -> ((1L, "invalid"))))       // NULL source
    // accounting closes: every valid batch doc is manifested XOR rejected
    val manifested = spark.read.parquet(s"$root/manifest").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(manifested === Set(31L, 33L, 35L))
    assert((manifested ++ got.keySet) ===
      (dayA ++ dayB).map(_._1).toSet)
    // full replays (in order and out of order): no new rows
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    assert(rejects() === got)

    // HEAL: day C redelivers doc 38 with a corrected source; it is
    // admitted, gate-passes, and enters the release — its 'invalid'
    // row must drop (a released doc cannot stay marked rejected),
    // while the genuinely-dropped docs keep theirs
    val b3 = withEmb(Seq((38L, "B", e4))).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b3, 2L, quota, centroids, root)
    val healed = rejects()
    assert(!healed.contains(38L))
    assert(healed === got - 38L)
    val manifested2 = spark.read.parquet(s"$root/manifest").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(manifested2.contains(38L))
    // the accounting identity survives the heal
    assert((manifested2 ++ healed.keySet) === (dayA ++ dayB).map(_._1).toSet)
  }

  test("monitored ingest: a late-delivered exact-dup group minimum fails loudly; " +
    "a late lower id with new text does not") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_ooo")
    val t1 = "the quantum processor executed seventeen benchmark workloads and " +
      "delivered consistent throughput across distributed clusters while " +
      "maintaining thermal stability under sustained production traffic in " +
      "the experimental datacenter during extended validation periods"
    val t2 = "the research consortium published comprehensive findings about " +
      "glacier dynamics and sediment transport in mountainous watersheds " +
      "demonstrating measurable correlations between seasonal temperature " +
      "gradients and downstream aquifer recharge patterns across decades"
    val b1 = withEmb(Seq((41L, "A", t1), (43L, "A", t2)))
      .toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    assert(spark.read.parquet(s"$root/manifest")
      .collect().map(_.getAs[Long]("doc_id")).toSet === Set(41L, 43L))

    // a lower doc_id whose text's md5 group is ALREADY manifested under
    // a higher id: accepting first-write-wins here would diverge from
    // the batch gate's min-doc_id rule — must throw, not silently drop
    val late = withEmb(Seq((40L, "A", t1)))
      .toDF("doc_id", "source", "text", "embedding")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.dailyIngestMonitoredBatch(spark, late, 1L, quota, centroids, root)
    }
    assert(e.getMessage.contains("out-of-order drain"))

    // a late lower id with a NEW md5 is order-insensitive (the batch
    // replay writes the same row) — must pass, not be over-constrained
    // by a blanket ascending-id contract
    val t3 = "the orchestra rehearsed intricate passages from contemporary " +
      "compositions and refined ensemble balance through deliberate " +
      "sectional practice while guest conductors introduced interpretive " +
      "approaches rooted in historical performance scholarship"
    val fine = withEmb(Seq((39L, "B", t3)))
      .toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, fine, 2L, quota, centroids, root)
    assert(spark.read.parquet(s"$root/manifest")
      .collect().map(_.getAs[Long]("doc_id")).toSet === Set(39L, 41L, 43L))
  }

  test("monitored ingest: novelty monitor — observed new-token mass vs Good-Turing " +
    "prediction, replay-stable, flags an all-new batch") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_oov")
    val b1docs = Seq(
      (41L, "A", "alpha beta alpha"),
      (42L, "A", "gamma alpha delta delta"))
    val b2docs = Seq((43L, "B", "alpha newone newtwo newtwo delta"))
    val b3docs = Seq((44L, "B", "zz qq ww ee rr tt yy uu")) // every type new
    def df(d: Seq[(Long, String, String)]) =
      withEmb(d).toDF("doc_id", "source", "text", "embedding")
    def oovRows() = spark.read.parquet(s"$root/oov").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (r.getAs[Long]("n_tokens"),
          Option(r.getAs[java.lang.Long]("observed_new_mu")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("predicted_new_mu")).map(_.toLong),
          r.getAs[Int]("flag"))).toMap

    // ---- independent expectation from the raw doc seqs ----
    def toks(d: Seq[(Long, String, String)]) = d.flatMap(_._3.split(" ", -1))
    def expect(hist: Seq[(Long, String, String)], cur: Seq[(Long, String, String)])
        : (Long, Option[Long], Option[Long], Int) = {
      val h = toks(hist).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val c = toks(cur).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val n = c.values.sum
      if (h.isEmpty || n == 0) (n, None, None, 0)
      else {
        val obs = c.collect { case (w, tf) if !h.contains(w) => tf }.sum * 1000000L / n
        val pred = h.values.count(_ == 1L).toLong * 1000000L / h.values.sum
        (n, Some(obs), Some(pred), if (obs > 3L * pred) 1 else 0)
      }
    }
    StreamingOps.dailyIngestMonitoredBatch(spark, df(b1docs), 0L, quota, centroids, root)
    assert(oovRows() === Map(0L -> expect(Nil, b1docs)))
    assert(oovRows()(0L)._2.isEmpty, "first batch has no history: NULL rates")
    StreamingOps.dailyIngestMonitoredBatch(spark, df(b2docs), 1L, quota, centroids, root)
    val after2 = oovRows()
    assert(after2 === Map(0L -> expect(Nil, b1docs), 1L -> expect(b1docs, b2docs)))
    assert(after2(1L)._4 === 0, "a mostly-familiar batch must not flag")
    // replay of batch 2: first write wins on BOTH the readout and the ledger
    val vocabBefore = spark.read.parquet(s"$root/vocab").collect().map(_.toSeq).toSet
    StreamingOps.dailyIngestMonitoredBatch(spark, df(b2docs), 1L, quota, centroids, root)
    assert(oovRows() === after2)
    assert(spark.read.parquet(s"$root/vocab").collect().map(_.toSeq).toSet === vocabBefore)
    // an all-new batch must trip the flag (observed 10^6 vs small P0)
    StreamingOps.dailyIngestMonitoredBatch(spark, df(b3docs), 2L, quota, centroids, root)
    val row3 = oovRows()(2L)
    assert(row3 === expect(b1docs ++ b2docs, b3docs))
    assert(row3._2 === Some(1000000L) && row3._4 === 1)

    // ---- the release DECISION log: the novelty flag is composed into
    // the release decision as an auditable per-batch row ----
    def releaseLog() = spark.read.parquet(s"$root/release_log").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (r.getAs[Int]("novelty_flag"), r.getAs[String]("decision"),
          r.getAs[String]("rationale"))).toMap
    assert(releaseLog() === Map(
      0L -> (0, "release", "normal"),
      1L -> (0, "release", "normal"),
      2L -> (1, "release", "novelty_flagged_release_pending_review")),
      "a flagged batch must release WITH the recorded review rationale; " +
        "unflagged batches record 'normal'")
    // the policy's substance: release membership stays the pure
    // manifest ⋈ survivors composition — the flag changes the decision
    // RECORD, never the released doc set (batch-boundary invariance)
    val wantRelease = spark.read.parquet(s"$root/manifest").select("doc_id")
      .join(spark.read.parquet(s"$root/survivors").select("doc_id"), Seq("doc_id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val gotRelease = spark.read.parquet(s"$root/release")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(gotRelease === wantRelease,
      "flagged-batch docs must not be quarantined out of the released set")
    // replay of the flagged batch: first write wins on the decision too
    StreamingOps.dailyIngestMonitoredBatch(spark, df(b3docs), 2L, quota, centroids, root)
    assert(releaseLog()(2L) === ((1, "release", "novelty_flagged_release_pending_review")))
    spark.catalog.clearCache()
  }

  test("monitored ingest: mid-pipeline crash and full replay leave all seventeen artifacts unchanged") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val cleanRoot = tmp("graft_mingest_clean")
    val crashRoot = tmp("graft_mingest_crash")
    val b1 = withEmb(day1).toDF("doc_id", "source", "text", "embedding")
    val b2 = withEmb(day2).toDF("doc_id", "source", "text", "embedding")

    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, cleanRoot)
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, cleanRoot)

    // crashed run: batch 1 completes; batch 2 "dies" after the dedup
    // chain but BEFORE index maintenance and the reports — then the
    // batch is redelivered and the full monitored body runs again
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, crashRoot)
    StreamingOps.dailyIngestBatch(spark, b2, quota, crashRoot)
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, crashRoot)

    assert(artifacts(crashRoot) === artifacts(cleanRoot))

    // at-least-once: day 1 replayed wholesale after day 2 — membership
    // (and first-write-wins history) keep every artifact fixed
    val before = artifacts(cleanRoot)
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, cleanRoot)
    assert(artifacts(cleanRoot) === before)
  }

  test("monitored ingest: new data under a recycled batch id fails loudly; true replay passes") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_collide")
    val b1 = withEmb(day1).toDF("doc_id", "source", "text", "embedding")
    val b2 = withEmb(day2).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)
    // a TRUE out-of-order replay reproduces the recorded full-batch
    // signature (even though its recomputed lifetime count is larger
    // than the first-write row) and must pass
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    val sigs = spark.read.parquet(s"$root/history").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (r.getAs[Long]("batch_sig"), r.getAs[Long]("n_sig"))).toMap
    assert(sigs.size === 2 && sigs(0L) != sigs(1L))
    // fresh checkpoint against the live stateRoot: the engine restarts
    // batchId at 0 but now carries day-3 data — NEW data under a
    // recycled id must fail loudly, and it must fail BEFORE stage 1:
    // every artifact (not just the history) is bit-identical after the
    // abort, so the operator can fix the checkpoint/stateRoot coupling
    // and resume without state surgery
    val before = artifacts(root)
    val b3 = withEmb(day3).toDF("doc_id", "source", "text", "embedding")
    val e = intercept[RuntimeException] {
      StreamingOps.dailyIngestMonitoredBatch(spark, b3, 0L, quota, centroids, root)
    }
    assert(e.getMessage.contains("recycled batch id"))
    assert(artifacts(root) === before,
      "the recycled-id abort must precede ANY artifact mutation")
  }

  test("monitored ingest: quota-rejected new data under a recycled id is still caught") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_rejected")
    val b1 = withEmb(day1).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    // new docs from source A only — A is at quota, so the admitted
    // work set of this batch is EMPTY; the r8 admitted-work-set
    // signature could not distinguish this from the original batch,
    // the full-batch signature does
    val rejected = Seq((21L, "A", "brand new text under a full source"))
      .map { case (id, s, t) => (id, s, t, emb(id)) }
      .toDF("doc_id", "source", "text", "embedding")
    val before = artifacts(root)
    val e = intercept[RuntimeException] {
      StreamingOps.dailyIngestMonitoredBatch(spark, rejected, 0L, quota, centroids, root)
    }
    assert(e.getMessage.contains("recycled batch id"))
    assert(artifacts(root) === before)
  }

  test("monitored ingest: a pre-signature history artifact upgrades in place") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_legacy")
    val b1 = withEmb(day1).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    // rewrite the history as a legacy artifact: (batch_seq, n_admitted)
    // only, the pre-r8 schema of a long-lived stateRoot
    val legacy = spark.read.parquet(s"$root/history")
      .select("batch_seq", "n_admitted").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    legacy.toSeq.toDF("batch_seq", "n_admitted")
      .write.mode("overwrite").parquet(s"$root/history")
    // the next drain must neither throw an unresolved-column error nor
    // trip the guard on the legacy row — it upgrades the schema and
    // signs its own row
    val b2 = withEmb(day2).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)
    val hist = spark.read.parquet(s"$root/history").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (Option(r.getAs[java.lang.Long]("batch_sig")), r.getAs[Long]("n_admitted"))).toMap
    assert(hist(0L)._1.isEmpty, "the legacy row keeps a NULL signature")
    assert(hist(1L)._1.isDefined, "the post-upgrade row is signed")
    // a replay of the legacy batch under its old id passes (no
    // signature to clash with), and new data under id 0 ALSO passes —
    // the documented hole for pre-upgrade rows, closed from batch 1 on
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root)
    val b3 = withEmb(day3).toDF("doc_id", "source", "text", "embedding")
    val e = intercept[RuntimeException] {
      StreamingOps.dailyIngestMonitoredBatch(spark, b3, 1L, quota, centroids, root)
    }
    assert(e.getMessage.contains("recycled batch id"))
  }

  test("monitored ingest + exactly-once sink: kill mid-batch, redeliver — rows exact, ledger monotone") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_sink")
    val url = "jdbc:derby:memory:graftmsink;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE main_m (doc_id BIGINT PRIMARY KEY, " +
        "source VARCHAR(16), text VARCHAR(256))")
      st.execute("CREATE TABLE stg_m (doc_id BIGINT, source VARCHAR(16), text VARCHAR(256))")
      st.execute("CREATE TABLE led_m (batch_id BIGINT PRIMARY KEY)")
      st.close()
    } finally conn.close()
    def readMain(): Set[Long] =
      spark.read.jdbc(url, "main_m", new java.util.Properties)
        .collect().map(_.getAs[Long]("DOC_ID")).toSet
    def readLedger(): Set[Long] =
      spark.read.jdbc(url, "led_m", new java.util.Properties)
        .collect().map(_.getAs[Long]("BATCH_ID")).toSet
    def sinkBatch(b: DataFrame, seq: Long): Boolean =
      StreamingOps.dailyIngestMonitoredSinkBatch(spark, b, seq, quota,
        centroids, root, url, "stg_m", "main_m", "doc_id", "led_m")

    val b1 = withEmb(day1).toDF("doc_id", "source", "text", "embedding")
    val b2 = withEmb(day2).toDF("doc_id", "source", "text", "embedding")

    // batch 0 applies: released = day-1 admitted survivors
    assert(sinkBatch(b1, 0L))
    val day1Released = readMain()
    assert(day1Released === readIds(s"$root/survivors"))
    assert(readLedger() === Set(0L))

    // CRASH mid-batch-1: the artifact stages complete, the process
    // dies BEFORE the JDBC transaction — redelivery of the whole
    // batch must upsert exactly once
    StreamingOps.dailyIngestMonitoredBatch(spark, b2, 1L, quota, centroids, root)
    assert(readLedger() === Set(0L), "the crashed batch must not be in the ledger")
    assert(sinkBatch(b2, 1L), "the redelivered batch applies")
    // released set after day 2 = day-1 released plus THIS batch's docs
    // that are admitted survivors (8 deduped away against day-1 doc 4)
    val day2Released = day2.map(_._1).toSet
      .intersect(readIds(s"$root/admitted"))
      .intersect(readIds(s"$root/survivors"))
    assert(readMain() === day1Released ++ day2Released,
      "main holds day-1 released plus day-2 released, each exactly once")
    assert(readLedger() === Set(0L, 1L))

    // CRASH after commit: redelivery of batch 1 — artifact stages
    // no-op by membership, the ledger skips the merge
    val mainBefore = readMain()
    assert(!sinkBatch(b2, 1L), "post-commit redelivery must be skipped by the ledger")
    assert(readMain() === mainBefore)
    assert(readLedger() === Set(0L, 1L), "ledger stays monotone — one row per batch")

    // the recycled-id guard still runs in the composed body
    val b3 = withEmb(day3).toDF("doc_id", "source", "text", "embedding")
    val e = intercept[RuntimeException] { sinkBatch(b3, 0L) }
    assert(e.getMessage.contains("recycled batch id"))
    assert(readMain() === mainBefore && readLedger() === Set(0L, 1L))
  }

  test("monitored ingest: tokenizer drift report — vocabulary-shifted batch flags, in-domain does not") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val root = tmp("graft_mingest_tokdrift")
    // a trained-vocabulary stand-in: all single chars plus the leading
    // bigram of every in-domain word — the shape a trained ULM vocab
    // has (full char coverage, multi-char pieces fitted to the corpus)
    val singles = (('a' to 'z').map(_.toString))
    val multis = (day1 ++ day2).flatMap(_._3.split(" "))
      .filter(_.length >= 2).map(_.take(2)).distinct
    val vocab = (singles ++ multis).toDF("piece")
    val b1 = withEmb(day1).toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root,
      tokVocab = Some(vocab))
    val d1 = spark.read.parquet(s"$root/tokdrift").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (r.getAs[Long]("oov_char_rate_mu"), r.getAs[Long]("multi_hit_rate_mu"),
          r.getAs[Int]("flag"))).toMap
    assert(d1(0L)._1 === 0L, "in-domain text has no OOV characters")
    assert(d1(0L)._2 > 500000L, "most in-domain words contain a learned piece")
    assert(d1(0L)._3 === 0, "an in-domain batch must not flag")

    // a vocabulary-shifted batch: digit-heavy tokens the trained vocab
    // has never seen — both metrics collapse and the monitor flags
    val shifted = Seq(
      (31L, "B", "99812 4417 80233 5521 90017 33345"),
      (32L, "B", "70могл 81threv 9xqz7 55011 1204 777"))
      .map { case (id, s, t) => (id, s, t, emb(id)) }
      .toDF("doc_id", "source", "text", "embedding")
    StreamingOps.dailyIngestMonitoredBatch(spark, shifted, 1L, quota, centroids, root,
      tokVocab = Some(vocab))
    val d2 = spark.read.parquet(s"$root/tokdrift").collect()
      .map(r => r.getAs[Long]("batch_seq") ->
        (r.getAs[Long]("oov_char_rate_mu"), r.getAs[Long]("multi_hit_rate_mu"),
          r.getAs[Int]("flag"))).toMap
    assert(d2(1L)._1 > 500000L, "shifted tokens are character-OOV")
    assert(d2(1L)._3 === 1, "the vocabulary-shifted batch must flag")
    // first-write-wins under replay, like every per-batch history row
    StreamingOps.dailyIngestMonitoredBatch(spark, b1, 0L, quota, centroids, root,
      tokVocab = Some(vocab))
    assert(spark.read.parquet(s"$root/tokdrift").count() === 2L)
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
