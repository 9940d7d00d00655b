package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming operators driven synchronously through MemoryStream +
  * memory sink (processAllAvailable). */
class StreamingSpec extends SparkSpec {
  import StreamingOps._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling window counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = tumblingCounts(df).writeStream
      .outputMode("complete").format("memory").queryName("tumb").start()
    in.addData((ts(0), "click", 1.0), (ts(2), "click", 2.0), (ts(7), "view", 3.0))
    q.processAllAvailable()
    val rows = spark.table("tumb").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type"), r.getAs[Long]("n_events")))
      .toSet
    q.stop()
    assert(rows === Set(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 00:05:00.0", "view", 1L)))
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "user_id")
    val q = sessionWindows(df).writeStream
      .outputMode("complete").format("memory").queryName("sess").start()
    // user 1: events at 0 and 20min (same session), then 60min (new session)
    in.addData((ts(0), 1L), (ts(20), 1L), (ts(60), 1L), (ts(5), 2L))
    q.processAllAvailable()
    val rows = spark.table("sess").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toList
    q.stop()
    assert(rows.count(_._1 == 1L) === 2)
    assert(rows.filter(_._1 == 1L).map(_._2).sorted === List(1L, 2L))
    assert(rows.count(_._1 == 2L) === 1)
  }

  test("stateful sessionize emits closed sessions after watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = sessionize(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fmgs").start()
    in.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(10), 1.0))
    q.processAllAvailable()
    // Advance event time far enough (> gap + watermark) to close user 1's session
    in.addData(Ev(2L, ts(300), 1.0))
    q.processAllAvailable()
    in.addData(Ev(2L, ts(600), 1.0))
    q.processAllAvailable()
    val rows = spark.table("fmgs").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSet
    q.stop()
    assert(rows.contains((1L, 2L)))
  }

  test("stateful sessionize widens, never inverts, on an out-of-order later batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = sessionize(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fmgs_ooo").start()
    // batch 1: event at t=10min; batch 2: OUT-OF-ORDER event at t=6min
    // (within watermark). The session must widen to [6,10], not move
    // its end back to 6 — an inverted session would also wrongly split
    // the next on-time event at t=27min (27-6=21min < gap, same session)
    in.addData(Ev(1L, ts(10), 1.0))
    q.processAllAvailable()
    in.addData(Ev(1L, ts(6), 1.0))
    q.processAllAvailable()
    in.addData(Ev(1L, ts(27), 1.0))
    q.processAllAvailable()
    in.addData(Ev(2L, ts(300), 1.0)) // advance watermark past the gap
    q.processAllAvailable()
    in.addData(Ev(2L, ts(600), 1.0))
    q.processAllAvailable()
    val rows = spark.table("fmgs_ooo").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
      .filter(_._1 == 1L).toList
    q.stop()
    assert(rows === List((1L, ts(6).getTime * 1000L, ts(27).getTime * 1000L, 3L)),
      s"expected one widened session [6,27]min x3 events, got $rows")
  }

  test("stateful sessionize: a late event more than a gap BEFORE the open session is its own session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // gap (5 min) < watermark delay (10 min): an out-of-order event can
    // arrive more than a gap before the open session's start. It must
    // form its OWN session, not be absorbed across a silence longer
    // than the gap (the single-session state could only absorb it).
    val q = sessionize(in.toDS(), gapMinutes = 5).writeStream
      .outputMode("append").format("memory").queryName("fmgs_late").start()
    in.addData(Ev(1L, ts(100), 1.0))
    q.processAllAvailable()
    in.addData(Ev(1L, ts(94), 1.0)) // watermark is 90min: late but admissible
    q.processAllAvailable()
    in.addData(Ev(2L, ts(300), 1.0)) // advance watermark past both
    q.processAllAvailable()
    in.addData(Ev(2L, ts(600), 1.0))
    q.processAllAvailable()
    val rows = spark.table("fmgs_late").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
      .filter(_._1 == 1L).toList.sortBy(_._2)
    q.stop()
    assert(rows === List(
      (1L, ts(94).getTime * 1000L, ts(94).getTime * 1000L, 1L),
      (1L, ts(100).getTime * 1000L, ts(100).getTime * 1000L, 1L)),
      s"expected two separate 1-event sessions at 94min and 100min, got $rows")
  }

  test("stateful sessionize: a late event bridging two open sessions merges them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = sessionize(in.toDS(), gapMinutes = 5).writeStream
      .outputMode("append").format("memory").queryName("fmgs_bridge").start()
    // two open sessions 9 minutes apart (> gap), then a late event
    // between them within gap of both — session_window merge semantics
    // say all three coalesce into ONE session
    in.addData(Ev(1L, ts(91), 1.0), Ev(1L, ts(100), 1.0))
    q.processAllAvailable()
    in.addData(Ev(1L, ts(95), 1.0)) // bridges [91,91] and [100,100]
    q.processAllAvailable()
    in.addData(Ev(2L, ts(300), 1.0))
    q.processAllAvailable()
    in.addData(Ev(2L, ts(600), 1.0))
    q.processAllAvailable()
    val rows = spark.table("fmgs_bridge").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
      .filter(_._1 == 1L).toList
    q.stop()
    assert(rows === List((1L, ts(91).getTime * 1000L, ts(100).getTime * 1000L, 3L)),
      s"expected one bridged session [91,100]min x3, got $rows")
  }

  test("streaming dedup collapses re-scraped keys within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val df = in.toDF().toDF("ts", "link", "price")
    val q = dedupByKey(df, "link", "ts", "1 hour").writeStream
      .outputMode("append").format("memory").queryName("dedup").start()
    in.addData((ts(0), "a", 1L), (ts(1), "a", 2L), (ts(2), "b", 3L))
    q.processAllAvailable()
    val rows = spark.table("dedup").collect().map(_.getAs[String]("link")).toList
    q.stop()
    assert(rows.sorted === List("a", "b"))
  }

  test("Trigger.AvailableNow over a landing dir: the reference's daily-batch upsert") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_landing").toString
    val landing = s"$dir/landing"
    val target = s"$dir/target"

    // day 1 lands, stream drains it, merge applies
    Seq(("a", 1L), ("b", 2L)).toDF("link", "price")
      .write.mode("append").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    def drain(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema).parquet(landing)
      val q = StreamingOps.upsertEachBatch(spark, stream, "link", target, s"$dir/$ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain("ckpt")
    assert(spark.read.parquet(target).count() === 2)

    // day 2 lands (re-scrape of b + new c); same checkpoint → only the
    // new file is processed, upsert is idempotent across runs
    Seq(("b", 99L), ("c", 3L)).toDF("link", "price")
      .write.mode("append").parquet(landing)
    drain("ckpt")
    val out = spark.read.parquet(target).collect()
      .map(r => (r.getAs[String]("link"), r.getAs[Long]("price"))).toSet
    assert(out === Set(("a", 1L), ("b", 99L), ("c", 3L)))
  }

  test("foreachBatch upsert maintains merge semantics across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val target = s"$dir/target"
    val in = MemoryStream[(String, Long)]
    val df = in.toDF().toDF("link", "price")
    val q = StreamingOps.upsertEachBatch(spark, df, "link", target, s"$dir/ckpt").start()
    in.addData(("a", 1L), ("b", 2L))
    q.processAllAvailable()
    in.addData(("b", 99L), ("c", 3L))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(target).collect()
      .map(r => (r.getAs[String]("link"), r.getAs[Long]("price"))).toSet
    assert(out === Set(("a", 1L), ("b", 99L), ("c", 3L)))
  }

  test("source quota gate admits at most N per source, idempotent under replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{QuotaDoc, QuotaAdmit}
    val in = MemoryStream[QuotaDoc]
    val q = StreamingOps.sourceQuotaGate(in.toDS(), quota = 3)
      .writeStream.outputMode("update").format("memory").queryName("quota").start()
    // batch 1: source A over quota in one batch (doc_id order decides)
    in.addData(QuotaDoc(5, "A"), QuotaDoc(1, "A"), QuotaDoc(9, "A"), QuotaDoc(7, "A"))
    q.processAllAvailable()
    // batch 2: A is full (2 rejected), 5 is a REPLAY (no re-emit),
    // B starts fresh
    in.addData(QuotaDoc(2, "A"), QuotaDoc(5, "A"), QuotaDoc(4, "B"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quota").as[QuotaAdmit].collect()
      .map(a => (a.source, a.doc_id)).toSet
    // sequential per-batch replay: batch 1 admits A's 3 smallest ids;
    // batch 2 admits only B's doc
    assert(got === Set(("A", 1L), ("A", 5L), ("A", 7L), ("B", 4L)))
  }

  test("streaming cluster maintenance equals batch CC, including replayed edges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstream").toString
    val target = s"$dir/target"
    val in = MemoryStream[(Long, Long)]
    val df = in.toDF().toDF("a", "b")
    val q = StreamingOps.clusterMaintenance(spark, df, target, s"$dir/ckpt").start()
    // batch 1 seeds two components; batch 2 merges them through a new
    // node AND replays an already-applied edge (at-least-once); batch 3
    // adds a fresh component whose min undercuts nothing
    in.addData((1L, 2L), (10L, 11L))
    q.processAllAvailable()
    in.addData((30L, 2L), (30L, 10L), (1L, 2L))
    q.processAllAvailable()
    in.addData((40L, 41L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(target).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val all = Seq((1L, 2L), (10L, 11L), (30L, 2L), (30L, 10L), (40L, 41L))
    val full = graft.ops.Cluster.connectedComponents(all.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === full)
    assert(got(30L) === 1L && got(11L) === 1L && got(41L) === 40L)
  }

  test("streaming tumbling aggregation equals the batch form on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (ts(0), "click", 1.5), (ts(2), "click", 2.25), (ts(4), "view", 0.75),
      (ts(7), "view", 3.0), (ts(11), "click", 1.0))
    // streaming path
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = tumblingCounts(in.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete").format("memory").queryName("eqv").start()
    in.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.table("eqv").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    // batch path: the oracle-checked SqlOps.eventsTumbling over the same rows
    events.toDF("ts", "event_type", "value").createOrReplaceTempView("events")
    val batch = spark.sql(graft.ops.SqlOps.eventsTumbling(graft.ops.SparkDialect))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
  }

  test("streaming hopping aggregation equals the batch form on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (ts(0), "click", 1.5), (ts(2), "click", 2.25), (ts(4), "view", 0.75),
      (ts(7), "view", 3.0), (ts(11), "click", 1.0), (ts(13), "view", 2.0))
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = hoppingCounts(in.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete").format("memory").queryName("hopeqv").start()
    in.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.table("hopeqv").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2)))
      .toSet
    q.stop()
    // batch path: the oracle-checked SqlOps.eventsHopping over the same rows
    events.toDF("ts", "event_type", "value").createOrReplaceTempView("events")
    val batch = spark.sql(graft.ops.SqlOps.eventsHopping(graft.ops.SparkDialect))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    // each event lands in exactly 2 windows
    assert(streamed.toSeq.map(_._3).sum === 2L * events.size)
  }

  test("streaming CDC apply equals the batch keep-latest result, even out of order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch op's change stream, with event times derived from seq
    graft.Tables.orders(spark, sf001).createOrReplaceTempView("orders")
    val changes = spark.sql(
      """SELECT o_orderkey AS key, 1 AS seq, 'I' AS op,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS value FROM orders
        |UNION ALL
        |SELECT o_orderkey, 2, 'U',
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT o_orderkey, 3, 'D', CAST(NULL AS DOUBLE) FROM orders WHERE o_orderkey % 5 = 0""".stripMargin)
      .collect()
      .map(r => StreamingOps.Chg(r.getAs[Long]("key"), ts(r.getAs[Int]("seq")),
        r.getAs[Int]("seq"), r.getAs[String]("op"),
        Option(r.get(3)).map(_.asInstanceOf[Double]).getOrElse(Double.NaN)))
    val in = MemoryStream[StreamingOps.Chg]
    val q = StreamingOps.cdcLatest(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("cdcs").start()
    // deliver REVERSED (deletes and updates before inserts) — within
    // the watermark, arrival order must not matter
    in.addData(changes.reverse.toIndexedSeq: _*)
    q.processAllAvailable()
    // two sentinel advances: watermark updates at batch end, timeouts
    // fire the batch after
    in.addData(StreamingOps.Chg(-1L, ts(600), 0, "I", 0.0))
    q.processAllAvailable()
    in.addData(StreamingOps.Chg(-2L, ts(1200), 0, "I", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("cdcs").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Double]("value"), r.getAs[Int]("last_seq")))
      .filter(_._1 >= 0).toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q_cdc_apply")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Double]("val"), r.getAs[Int]("last_seq")))
      .toSet
    assert(streamed === batch)
  }

  test("streaming anomaly gate matches the batch MAD outlier counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth: per-type outlier counts from the oracle-gated query
    val batch = graft.SparkEntry.queries("q_anomaly_mad")(spark, sf001).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_outliers")).toMap
    // static stats side = the same staged median/MAD tables
    graft.Tables.events(spark, sf001).createOrReplaceTempView("events")
    spark.sql(graft.ops.SqlOps.anomalyMad.stages(0)._2(graft.ops.SparkDialect))
      .createOrReplaceTempView("madm")
    val stats = spark.sql(graft.ops.SqlOps.anomalyMad.stages(1)._2(graft.ops.SparkDialect))
    val evs = graft.Tables.events(spark, sf001)
      .selectExpr("event_id", "user_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val in = MemoryStream[(Long, Long, String, Double)]
    val q = StreamingOps.anomalyGate(
        in.toDF().toDF("event_id", "user_id", "event_type", "value"), stats)
      .writeStream.outputMode("append").format("memory").queryName("anom").start()
    in.addData(evs.toSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("anom").collect()
      .groupBy(_.getAs[String]("event_type")).view.mapValues(_.length.toLong).toMap
    q.stop()
    assert(streamed === batch.filter(_._2 > 0))
  }

  test("streaming experiment monitor: cumulative z equals the batch two-proportion " +
    "test; replay is a no-op; late conversions flip the state") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_abmon").toString
    // 8 users (4 per arm); the value>150 conversion rule straddled on
    // purpose (u5 purchases 149 — never converts); u7 and u6 convert
    // only in batch 2, so the state must FLIP, not re-derive
    def ev(id: Long, u: Long, t: String, v: Double) = (id, u, t, v)
    val b1 = Seq(
      ev(1, 0, "purchase", 200.0), ev(2, 1, "view", 10.0),
      ev(3, 2, "purchase", 100.0), ev(4, 3, "purchase", 160.0),
      ev(5, 4, "click", 5.0), ev(6, 5, "purchase", 149.0),
      ev(7, 6, "view", 1.0), ev(8, 7, "purchase", 10.0))
    val b2 = Seq(
      ev(9, 7, "purchase", 400.0), ev(10, 6, "purchase", 155.0),
      ev(11, 2, "view", 2.0))
    def df(rows: Seq[(Long, Long, String, Double)]) =
      rows.toDF("event_id", "user_id", "event_type", "value")
    StreamingOps.abMonitorBatch(spark, df(b1), 0L, root)
    StreamingOps.abMonitorBatch(spark, df(b2), 1L, root)
    // replay batch 0 wholesale: MAX-merge state and the first-write-wins
    // log must both be unchanged (u7's replayed converted=0 must NOT
    // regress the state)
    val usersBefore = spark.read.parquet(s"$root/ab_users").collect().map(_.toSeq).toSet
    val logBefore = spark.read.parquet(s"$root/ab_log").collect().map(_.toSeq).toSet
    StreamingOps.abMonitorBatch(spark, df(b1), 0L, root)
    assert(spark.read.parquet(s"$root/ab_users").collect().map(_.toSeq).toSet === usersBefore)
    assert(spark.read.parquet(s"$root/ab_log").collect().map(_.toSeq).toSet === logBefore)
    // parity: the cumulative batch-1 row equals the batch q_ab_test SQL
    // over the union of everything delivered — identical columns, same
    // rendered z arithmetic
    df(b1 ++ b2).createOrReplaceTempView("events")
    val want = spark.sql(graft.ops.SqlOps.abTest(graft.ops.SparkDialect))
      .collect().head.toSeq
    val got = spark.read.parquet(s"$root/ab_log")
      .filter(col("batch_seq") === 1L)
      .select("n0", "c0", "n1", "c1", "rate_a", "rate_b", "z_score")
      .collect().head.toSeq
    assert(got === want)
    val conv = spark.read.parquet(s"$root/ab_users").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("converted")).toMap
    assert(conv(7L) === 1 && conv(6L) === 1 && conv(5L) === 0)
    spark.catalog.dropTempView("events")
  }

  test("streaming prefix probe: folded pair set equals the batch delta probe " +
    "over the delivered union; replay is a no-op") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pfx").toString
    val idx = java.nio.file.Files.createTempDirectory("graft_pfx_idx").toString
    graft.functions.GraftFunctions.registerAll(spark)
    graft.Tables(spark, sf001, "documents").createOrReplaceTempView("documents")
    // the staged index as parquet artifacts (what the batch index pass
    // ships): pfx_dsh, then pfx_rk which reads the pfx_dsh view
    graft.ops.SqlOps.dedupPrefix.stages.foreach { case (name, build) =>
      spark.sql(build(graft.ops.SparkDialect))
        .write.mode("overwrite").parquet(s"$idx/$name")
      spark.read.parquet(s"$idx/$name").createOrReplaceTempView(name)
    }
    // delivered union = the NewDoc slice, split across two batches so
    // cross-batch pairs must come from the index probe, not the batch
    val newIds = spark.sql(
      s"""SELECT DISTINCT doc_id FROM pfx_dsh
         |WHERE doc_id % ${graft.ops.SqlOps.NewDocMod} = ${graft.ops.SqlOps.NewDocRem}""".stripMargin)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(newIds.size >= 2, "fixture must have multiple new docs")
    val (b1, b2) = newIds.splitAt(newIds.size / 2)
    def df(ids: Seq[Long]) = ids.toDF("doc_id")
    StreamingOps.prefixProbeBatch(spark, df(b1), idx, root)
    StreamingOps.prefixProbeBatch(spark, df(b2), idx, root)
    val folded = spark.read.parquet(s"$root/pfx_pairs").collect().map(_.toSeq).toSet
    // replay batch 1 wholesale: membership is a pure function of the
    // delivered doc set, so the fold must be a no-op
    StreamingOps.prefixProbeBatch(spark, df(b1), idx, root)
    assert(spark.read.parquet(s"$root/pfx_pairs").collect().map(_.toSeq).toSet === folded)
    // parity: the delivered union IS the NewDoc slice, so the folded
    // set must equal the batch delta probe's verified pairs
    val want = spark.sql(
      graft.ops.SqlOps.dedupPrefixDelta.body(graft.ops.SparkDialect))
      .collect().map(_.toSeq).toSet
    assert(folded === want)
    assert(want.nonEmpty, "vacuous fixture: the delta probe found no pair")
    spark.catalog.dropTempView("documents")
  }

  test("streaming conformal gate admits exactly the batch conf >= tau set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static side: the same staged calibration table and the same
    // single-sourced tau select the batch query nests as its CTE
    graft.Tables.documents(spark, sf001).createOrReplaceTempView("documents")
    spark.sql(graft.ops.SqlOps.filterConformal.stages(0)._2(graft.ops.SparkDialect))
      .createOrReplaceTempView("conf_sc")
    val tau = spark.sql(graft.ops.SqlOps.confTauSelect(graft.ops.SparkDialect))
    // batch truth: every doc whose score clears the calibrated cutoff
    val expected = spark.sql(
      s"""SELECT doc_id FROM conf_sc CROSS JOIN (
         |${graft.ops.SqlOps.confTauSelect(graft.ops.SparkDialect)}
         |) WHERE conf >= tau""".stripMargin)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(expected.nonEmpty, "fixture must admit at least one doc")
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(expected.size < docs.length, "tau must actually reject some docs")
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.conformalGate(in.toDF().toDF("doc_id", "text"), tau)
      .writeStream.outputMode("append").format("memory").queryName("confg").start()
    in.addData(docs.toIndexedSeq: _*)
    q.processAllAvailable()
    val admitted = spark.table("confg").collect()
    q.stop()
    assert(admitted.map(_.getAs[Long]("doc_id")).toSet === expected)
    // every admitted row carries the tau it was admitted under
    val tauVal = tau.collect().head.getAs[Long]("tau")
    assert(admitted.forall(r => r.getAs[Long]("tau_admitted") == tauVal
      && r.getAs[Long]("conf") >= tauVal))
  }

  test("streaming PII gate redacts and counts identically to the batch projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "reach alice@example.com or (415) 555-1234 now"),
      (1L, "cards 4111-1111-1111-1111 and 10.0.0.1 and 10.0.0.2"),
      (2L, "a clean line with nothing to hide"))
    // batch truth: the same projection over a static frame
    val batch = StreamingOps.piiRedactStream(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.piiRedactStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("piig").start()
    in.addData(docs: _*)
    q.processAllAvailable()
    val streamed = spark.table("piig").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    q.stop()
    assert(streamed.keySet === batch.keySet)
    docs.foreach { case (id, _) =>
      assert(streamed(id).getAs[String]("text_redacted") ===
        batch(id).getAs[String]("text_redacted"))
      Seq("n_card", "n_email", "n_ipv4", "n_phone").foreach { c =>
        assert(streamed(id).getAs[Long](c) === batch(id).getAs[Long](c))
      }
    }
    // the planted signal actually fires and the redaction took
    assert(streamed(0L).getAs[Long]("n_email") === 1L
      && streamed(0L).getAs[Long]("n_phone") === 1L)
    assert(streamed(1L).getAs[Long]("n_card") === 1L
      && streamed(1L).getAs[Long]("n_ipv4") === 2L)
    assert(streamed(0L).getAs[String]("text_redacted").contains("[EMAIL]"))
    assert(streamed(1L).getAs[String]("text_redacted").contains("[CARD]"))
    assert(streamed(2L).getAs[String]("text_redacted") === docs(2)._2)
  }

  test("streaming corpus gate equals the batch corpus filter on in-order arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real fixture docs, streamed in doc_id order with synthetic
    // arrival times (the batch filter's keep-smallest-id survivor rule
    // coincides with streaming first-seen under in-order arrival)
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .sortBy(_.getAs[Long]("doc_id"))
      .map(r => (ts(r.getAs[Long]("doc_id").toInt / 60), r.getAs[Long]("doc_id"),
        r.getAs[String]("text")))
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingOps.corpusGate(in.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("cgate").start()
    in.addData(docs.toIndexedSeq: _*)
    q.processAllAvailable()
    // compare at CONTENT level: which member of an exact-dup group
    // survives differs legitimately (batch keeps smallest id, a stream
    // keeps first seen, and partition order can break the tie either
    // way) — the surviving content, score, and guess must not
    val streamed = spark.table("cgate").collect()
      .map(r => (r.getAs[String]("content_hash"), r.getAs[String]("lang_guess"),
        r.getAs[Double]("quality"))).toSet
    val nStreamed = spark.table("cgate").count()
    q.stop()
    // batch path: the oracle-checked corpusFilter over the same table
    graft.Tables.documents(spark, sf001).createOrReplaceTempView("documents")
    graft.functions.GraftFunctions.registerAll(spark)
    val batch = spark.sql(
      s"""WITH f AS (${graft.ops.SqlOps.corpusFilter(graft.ops.SparkDialect)})
         |SELECT md5(d.text) AS content_hash, f.lang_guess, f.quality
         |FROM f JOIN documents d ON f.doc_id = d.doc_id""".stripMargin)
      .collect()
      .map(r => (r.getAs[String]("content_hash"), r.getAs[String]("lang_guess"),
        r.getAs[Double]("quality"))).toSet
    assert(nStreamed === batch.size, "one survivor per content group")
    assert(streamed === batch,
      s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
  }

  test("stream-stream interval join pairs clicks with recent purchases only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val q = clickPurchaseJoin(
        clicks.toDF().toDF("ts", "user_id"),
        purchases.toDF().toDF("ts", "user_id"))
      .writeStream.outputMode("append").format("memory").queryName("cpj").start()
    // user 1: purchase 10 min before click (in window) and 50 min
    // before (outside); user 2: purchase AFTER the click (excluded)
    purchases.addData((ts(0), 1L), (ts(40), 1L), (ts(70), 2L))
    clicks.addData((ts(50), 1L), (ts(60), 2L))
    q.processAllAvailable()
    val rows = spark.table("cpj").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("click_ts").toString, r.getAs[Timestamp]("purchase_ts").toString))
      .toSet
    q.stop()
    assert(rows === Set((1L, "2024-01-01 00:50:00.0", "2024-01-01 00:40:00.0")))
  }

  test("foreachBatch upsert dedups repeated keys within one micro-batch (keep-last)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_dup").toString
    val target = s"$dir/target"
    val in = MemoryStream[(String, Long, Long)]
    val df = in.toDF().toDF("link", "price", "ord")
    val q = StreamingOps.upsertEachBatch(spark, df, "link", target, s"$dir/ckpt",
      orderCol = Some("ord")).start()
    // same key twice within one drain (re-scrape within one day): the
    // reference's sequential ON CONFLICT applies the later row
    in.addData(("a", 1L, 0L), ("a", 7L, 1L), ("b", 2L, 2L))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(target).collect()
      .map(r => (r.getAs[String]("link"), r.getAs[Long]("price"))).toSet
    assert(out === Set(("a", 7L), ("b", 2L)))
  }

  test("streaming minhash candidates equal the batch LSH pair set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.registerAll(spark)
    // the SAME two-snapshot corpus the batch op dedups (ids 2d / 2d+1)
    val docs = graft.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val corpus = docs.map { case (id, t) => (2 * id, t) } ++
      docs.map { case (id, t) => (2 * id + 1, t) }
    val base = ts(0).getTime
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.minhashCandidates(df)
      .writeStream.outputMode("append").format("memory").queryName("mhc").start()
    in.addData(corpus.zipWithIndex.map { case ((id, t), i) =>
      (id, new Timestamp(base + i * 10L), t) }.toIndexedSeq: _*)
    q.processAllAvailable()
    // at-least-once per band -> set-compare the normalized pairs
    val streamed = spark.table("mhc").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q_dedup_minhash")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(streamed === batch,
      s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
  }

  test("streaming substring candidates equal the batch window-index pair set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.registerAll(spark)
    // plain documents (no snapshot doubling): the batch op's dup rule
    // is "window carried by >= 2 distinct docs"
    val docs = graft.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val base = ts(0).getTime
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.substringCandidates(df)
      .writeStream.outputMode("append").format("memory").queryName("ssc").start()
    in.addData(docs.zipWithIndex.map { case ((id, t), i) =>
      (id, new Timestamp(base + i * 10L), t) }.toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("ssc").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("sid")))
      .toSet
    q.stop()
    // batch truth: the distinct (doc, window-hash) index self-joined
    val win = graft.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "explode(word_shingles(text, 8)) AS s")
      .selectExpr("doc_id", "xxhash64(s) AS sid").distinct()
    val expected = win.as("a").join(win.as("b"), "sid")
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"), col("sid")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === expected,
      s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    // link to the batch query: exactly the docs in some pair have
    // duplicated windows in q_dedup_substring
    val flagged = graft.SparkEntry.queries("q_dedup_substring")(spark, sf001)
      .filter(col("n_dup_windows") > 0).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(streamed.flatMap(p => Set(p._1, p._2)) === flagged)
  }

  test("pairStep: late rows never shrink the seen horizon; members dedup; pairs normalized") {
    // monotone max: a late-but-valid row (earlier ts) must not move
    // the expiry backwards — the timeout is re-armed from maxUs
    val (m1, max1, p1) = StreamingOps.pairStep(Nil, 0L, List((1000L, 7L)))
    assert(max1 === 1000L * 1000L && p1.isEmpty && m1 === List(7L))
    val (m2, max2, p2) = StreamingOps.pairStep(m1, max1, List((900L, 3L)))
    assert(max2 === max1, "late row shrank the seen horizon")
    assert(p2 === List((3L, 7L)), "pair not normalized (min, max)")
    // intra-key repeat of the same doc adds no member and no self-pair
    val (m3, _, p3) = StreamingOps.pairStep(m2, max2, List((950L, 7L)))
    assert(m3.toSet === Set(3L, 7L) && p3.isEmpty)
    // deterministic order: two new docs in one batch emit pairs in
    // (ts, id) order regardless of input order
    val (_, _, p4) = StreamingOps.pairStep(Nil, 0L, List((20L, 2L), (10L, 9L)))
    assert(p4 === List((2L, 9L)), "batch not processed in (ts, id) order")
  }

  test("streaming funnel matches the batch funnel stage counts on the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real events, fed in timestamp order (nothing late => the
    // watermark drops nothing and parity with batch is exact)
    val evs = graft.Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => StreamingOps.FEv(r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts"), r.getAs[String]("event_type")))
      .sortBy(_.ts.getTime)
    // quiet gap > the whole span: every user has ONE episode covering
    // all their events — the batch funnel's frame — closed only by the
    // far-future sentinels
    val spanMin = ((evs.last.ts.getTime - evs.head.ts.getTime) / 60000L + 120L).toInt
    val in = MemoryStream[StreamingOps.FEv]
    val q = StreamingOps.funnelStages(in.toDS(), quietMinutes = spanMin)
      .writeStream.outputMode("append").format("memory").queryName("funl").start()
    in.addData(evs.toIndexedSeq: _*)
    q.processAllAvailable()
    // two sentinel advances: watermark updates at batch END, timeouts
    // fire in the NEXT batch
    def late(plusMin: Long) =
      new Timestamp(evs.last.ts.getTime + (spanMin + plusMin) * 60000L)
    in.addData(StreamingOps.FEv(-1L, late(60), "view"))
    q.processAllAvailable()
    in.addData(StreamingOps.FEv(-1L, late(10000), "view"))
    q.processAllAvailable()
    val streamed = spark.table("funl").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage")))
      .filter(_._1 >= 0).toMap
    q.stop()
    // independent Scala reimplementation of the batch stage rules
    val byUser = evs.groupBy(_.user_id)
    val expected = byUser.flatMap { case (u, es) =>
      def us(e: StreamingOps.FEv) = e.ts.getTime
      val t1 = es.filter(_.event_type == "view").map(us).minOption
      val t2 = t1.flatMap(t => es.filter(e => e.event_type == "click" && us(e) > t).map(us).minOption)
      val t3 = t2.flatMap(t => es.filter(e => e.event_type == "purchase" && us(e) > t).map(us).minOption)
      val stage = if (t3.isDefined) 3 else if (t2.isDefined) 2 else if (t1.isDefined) 1 else 0
      Option.when(stage > 0)((u, stage))
    }
    assert(streamed === expected)
    // and the oracle-checked batch query agrees on the aggregate counts
    val batch = graft.SparkEntry.queries("q_events_funnel")(spark, sf001).collect()
      .map(r => (r.getAs[Int]("stage"), r.getAs[Long]("n_users"))).toMap
    assert(batch(1) === streamed.count(_._2 >= 1))
    assert(batch(2) === streamed.count(_._2 >= 2))
    assert(batch(3) === streamed.count(_._2 >= 3))
  }

  test("streaming transitions equal the batch transition counts on the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf001)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[StreamingOps.TEv].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val in = MemoryStream[StreamingOps.TEv]
    val q = StreamingOps.transitionStream(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("trans").start()
    // in-order batches with the middle batch replayed (dup-drop path)
    val batches = evs.grouped(evs.length / 3 + 1).toSeq
    in.addData(batches(0)); q.processAllAvailable()
    in.addData(batches(1)); q.processAllAvailable()
    in.addData(batches(1)); q.processAllAvailable()
    batches.drop(2).foreach { b => in.addData(b); q.processAllAvailable() }
    val streamed = spark.table("trans").collect()
      .map(r => (r.getAs[String]("prev"), r.getAs[String]("next")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    q.stop()
    val batch = graft.SparkEntry.queries("q_event_transitions")(spark, sf001).collect()
      .map(r => (r.getAs[String]("prev"), r.getAs[String]("next")) ->
        r.getAs[Long]("n_transitions")).toMap
    assert(streamed === batch)
  }

  test("streaming cusum monitor matches the textbook recursion and ignores replayed days") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same planted level shift as the batch OpsSpec test, with integer
    // mean so the producer quantization is exact: mu = 12 over the
    // stable prefix (slacked25 = 300, alarm40 = 480)
    val counts = (1 to 20).map(_ => 12L) ++ (1 to 10).map(_ => 24L)
    val in = MemoryStream[StreamingOps.DayCount]
    val q = StreamingOps.cusumMonitor(in.toDS(),
        Map("shifted" -> ((300L, 480L)), "unknown_type" -> ((1L, 1L))))
      .writeStream.outputMode("append").format("memory").queryName("cus").start()
    val days = counts.zipWithIndex.map { case (c, d) =>
      StreamingOps.DayCount("shifted", d.toLong, c) }
    // uneven micro-batches, with the first batch REPLAYED in the middle
    // (at-least-once redelivery must not advance the statistic twice)
    val batches = days.grouped(11).toSeq
    in.addData(batches.head); q.processAllAvailable()
    in.addData(batches.head); q.processAllAvailable()
    batches.tail.foreach { b => in.addData(b); q.processAllAvailable() }
    val rows = spark.table("cus").as[StreamingOps.CusumRow].collect()
    q.stop()
    assert(rows.map(_.day).sorted.toSeq === days.map(_.day),
      "exactly one emitted row per day despite the replay")
    // independent recursion (x20 scale): S = max(0, S + 20c - 300)
    var s = 0L; var alarms = 0L
    val expected = counts.zipWithIndex.map { case (c, d) =>
      s = math.max(0L, s + 20L * c - 300L)
      val alarm = s > 480L
      if (alarm) alarms += 1
      StreamingOps.CusumRow("shifted", d.toLong, s, alarm, alarms)
    }
    assert(rows.sortBy(_.day).toSeq === expected)
    assert(alarms > 0, "the planted shift must fire the monitor")
  }

  test("streaming heavy-hitter sketch keeps every key above the MG share bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Zipf-ish skew over 12 distinct keys with only k=4 slots: slot
    // pressure forces the eviction path in the streaming update AND the
    // state-store merge across micro-batches (the corpus-vocab batch
    // query never evicts — this is the adversarial coverage)
    val keys: Seq[Long] =
      (1 to 60).map(_ => 1L) ++ (1 to 30).map(_ => 2L) ++ (1 to 12).map(_ => 3L) ++
        (3 to 12).flatMap(i => (1 to 3).map(_ => i.toLong))
    val k = 4
    val in = MemoryStream[Long]
    val q = StreamingOps.heavyHitterSketch(in.toDF().toDF("key"), "key", k)
      .writeStream.outputMode("complete").format("memory").queryName("mgsk").start()
    // three micro-batches, deliberately uneven
    keys.grouped(45).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    val sketch = spark.table("mgsk").collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("est")).toMap
    q.stop()
    val n = keys.size
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // guarantee: any key with true share > 1/(k+1) survives the sketch
    truth.filter { case (_, c) => c * (k + 1) > n }.foreach { case (key, _) =>
      assert(sketch.contains(key), s"heavy key $key evicted: $sketch")
    }
    // estimates never overcount and undercount by at most n/(k+1)
    sketch.foreach { case (key, est) =>
      assert(est <= truth(key), s"key $key overcounted: $est > ${truth(key)}")
      assert(est >= truth(key) - n / (k + 1), s"key $key undercounted past the bound")
    }
    assert(sketch.size <= k)
  }

  test("streaming disorder monitor reproduces the batch deltas on planted disorder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same planted rows as the batch disorder test: two users, one
    // late event each
    val rows = Seq(
      StreamingOps.DisEv(1L, "view", 1L, new java.sql.Timestamp(100000L)),
      StreamingOps.DisEv(1L, "view", 2L, new java.sql.Timestamp(90000L)),
      StreamingOps.DisEv(1L, "click", 3L, new java.sql.Timestamp(130000L)),
      StreamingOps.DisEv(2L, "view", 4L, new java.sql.Timestamp(50000L)),
      StreamingOps.DisEv(2L, "click", 5L, new java.sql.Timestamp(45000L)),
      StreamingOps.DisEv(2L, "click", 6L, new java.sql.Timestamp(60000L)))
    val in = MemoryStream[StreamingOps.DisEv]
    val q = StreamingOps.disorderMonitor(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("dis").start()
    // uneven batches split USER 1's late event across batches — the
    // running max must carry through keyed state, not batch locals
    rows.grouped(2).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    val streamed = spark.table("dis").collect().map(r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("delta_s"))).toMap
    q.stop()
    val expected = Map(1L -> 0L, 2L -> 10L, 3L -> 0L, 4L -> 0L, 5L -> 5L, 6L -> 0L)
    assert(streamed === expected)
    // batch twin over the same rows: the SAME rendered SQL
    rows.toDS().createOrReplaceTempView("events")
    try {
      val batch = spark.sql(graft.ops.SqlOps.disorderProfile(graft.ops.SparkDialect))
        .collect().map(r => (r.getAs[String]("event_type"),
          (r.getAs[Long]("n_late"), r.getAs[Long]("max_delta_s")))).toMap
      val late = streamed.filter(_._2 > 0L)
      assert(batch("view") === ((1L, 10L)))
      assert(batch("click") === ((1L, 5L)))
      assert(late.values.toSeq.sorted === Seq(5L, 10L))
    } finally spark.catalog.dropTempView("events")
  }

  test("streaming count-min sketch is bit-identical to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // skewed keys with forced collisions (w=8 < 40 distinct keys) so
    // the parity claim covers colliding buckets, not just clean ones
    val keys: Seq[Long] = (1L to 40L).flatMap(k => Seq.fill((k % 5).toInt + 1)(k))
    val in = MemoryStream[Long]
    val q = StreamingOps.cmsSketchStream(in.toDF().toDF("key"), "key", w = 8, d = 3)
      .writeStream.outputMode("complete").format("memory").queryName("cmssk").start()
    // uneven micro-batches exercise state-store merges
    keys.grouped(17).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    val streamed = spark.table("cmssk").collect().head.getSeq[Long](0)
    q.stop()
    graft.functions.GraftFunctions.registerAll(spark)
    keys.toDF("key").createOrReplaceTempView("cms_batch_in")
    val batch = spark.sql("SELECT cms_sketch(key, 8, 3) FROM cms_batch_in")
      .collect().head.getSeq[Long](0)
    assert(streamed === batch,
      "CMS merges are commutative-associative adds; batching must not matter")
    // and the streamed sketch still carries the one-sided guarantee
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k0, c) =>
      val est = (0 until 3).map(r => streamed(
        2 + r * 8 + graft.functions.CmsHash.bucket(k0, r, 8))).min
      assert(est >= c, s"key $k0 undercounted")
    }
  }

  test("streaming histogram equals an independent binning under any batching, and clamps drift") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // calibration slice defines the frozen bounds; the stream then
    // carries in-range rows plus drifted rows outside the bounds
    val calib: Seq[(String, Double)] =
      (0 until 90).map(i => ("a", (i % 30) + 0.005 * (i % 3))) ++
      (0 until 90).map(i => ("b", (i % 60) * 2.5))
    // drift cases: out-of-bounds values on known types, plus a whole
    // event_type the calibration batch never saw (must surface in the
    // sentinel bin -1, never be silently dropped)
    val drift: Seq[(String, Double)] = Seq(("a", -50.0), ("a", 999.0), ("b", -1.0),
      ("c", 7.0), ("c", 8.0))
    val bounds = calib.groupBy(_._1).toSeq.map { case (t, rs) =>
      val cents = rs.map { case (_, v) => math.floor(v * 100 + 0.5).toLong }
      (t, cents.min, cents.max)
    }.toDF("event_type", "mn", "mx")
    val rows = calib ++ drift
    val in = MemoryStream[(String, Double)]
    val q = StreamingOps.histogramStream(in.toDF().toDF("event_type", "value"), bounds)
      .writeStream.outputMode("complete").format("memory").queryName("histsk").start()
    rows.grouped(41).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    val streamed = spark.table("histsk").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin"), r.getAs[Long]("cnt")))
      .sortBy(t => (t._1, t._2))
    q.stop()

    // ---- independent implementation (same frozen-bounds spec) ----
    val bmap = bounds.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy { case (t, v) =>
      (t, bmap.get(t) match {
        case None => -1L
        case Some((mn, mx)) =>
          val c = math.floor(v * 100 + 0.5).toLong
          math.max(0L, math.min(31L, (c - mn) * 32 / (mx - mn + 1)))
      })
    }.toSeq.map { case ((t, b), xs) => (t, b, xs.size.toLong) }.sortBy(t => (t._1, t._2))
    assert(streamed.toSeq === expected)
    // drift lands visibly at the edges — above-range in bin 31, the
    // uncalibrated type in the sentinel bin — never silently dropped
    assert(streamed.exists { case (t, b, _) => t == "a" && b == 31L })
    assert(streamed.exists { case (t, b, _) => t == "c" && b == -1L })
    assert(expected.map(_._3).sum === rows.size.toLong)
  }
}
