package graft.etl

import graft.SparkSpec

/** Merge/upsert semantics (reference src/load.py:30-43; FIXTURES.md A4). */
class LoadSpec extends SparkSpec {
  import spark.implicits._

  private val main = Seq(
    ("a", Some(100L), "old-a"),
    ("b", Some(200L), "old-b")).toDF("link", "price_rp", "name")
  private val staging = Seq(
    ("b", Some(999L), "new-b"),   // matched: full-row overwrite
    ("c", None, "new-c")          // unmatched: insert (with NULL price)
  ).toDF("link", "price_rp", "name")

  test("merge: matched keys take staging row wholesale, unmatched persist/insert") {
    val out = Load.merge(main, staging, "link")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getString(2))).toSet
    assert(out === Set(
      ("a", Some(100L), "old-a"),
      ("b", Some(999L), "new-b"),
      ("c", None, "new-c")))
  }

  test("merge: staging NULL overwrites main value (last-writer-wins)") {
    val s2 = Seq(("a", Option.empty[Long], "null-a")).toDF("link", "price_rp", "name")
    val out = Load.merge(main, s2, "link").where("link = 'a'").collect()(0)
    assert(Option(out.get(1)) === None)
    assert(out.getString(2) === "null-a")
  }

  test("merge is idempotent: applying the same staging twice == once") {
    val once  = Load.merge(main, staging, "link")
    val twice = Load.merge(once, staging, "link")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("insertedCount counts only new keys") {
    val n = Load.insertedCount(main, staging, "link").collect()(0).getLong(0)
    assert(n === 1L)
  }

  test("scd2 merge: closes changed versions, keeps history, opens new keys") {
    import org.apache.spark.sql.functions._
    val current = Seq(
      ("a", Some(100L), 0L, Option.empty[Long]),   // open, will change
      ("a", Some(50L), -10L, Some(0L)),            // closed history, untouched
      ("b", Some(200L), 0L, Option.empty[Long]),   // open, unchanged
      ("x", Some(7L), 0L, Option.empty[Long])      // open, absent from staging
    ).toDF("link", "price_rp", "valid_from", "valid_to")
    val staging = Seq(
      ("a", Some(999L)),  // changed
      ("b", Some(200L)),  // identical -> no new version
      ("c", Some(300L))   // brand new
    ).toDF("link", "price_rp")
    val out = Load.scd2Merge(current, staging, "link", batchTs = 42L)
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2), Option(r.get(3))))
      .toSet
    assert(out === Set(
      ("a", Some(50L), -10L, Some(0L)),    // history preserved
      ("a", Some(100L), 0L, Some(42L)),    // old version closed at batch ts
      ("a", Some(999L), 42L, None),        // new version open
      ("b", Some(200L), 0L, None),         // unchanged stays open, unmodified
      ("x", Some(7L), 0L, None),           // untouched key stays open
      ("c", Some(300L), 42L, None)))       // new key opens
    // idempotence: re-applying the same staging changes nothing
    val again = Load.scd2Merge(
      Load.scd2Merge(current, staging, "link", 42L), staging, "link", 43L)
    assert(again.count() === 6)
  }

  test("dated CSV sink + explicit-schema scan round-trip (stringly-typed stage)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val path = Load.datedCsv(main, "raw_listing", dir, java.time.LocalDate.of(2026, 8, 12))
    assert(path.endsWith("raw_listing_20260812"))
    // the reference re-reads interchange CSVs with erased types
    // (SURVEY.md §1): all-string schema, never inferSchema
    val schema = StructType(Seq(
      StructField("link", StringType), StructField("price_rp", StringType),
      StructField("name", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(path)
    assert(back.count() === main.count())
    assert(back.schema.fields.forall(_.dataType == StringType))
    val row = back.where("link = 'a'").collect()(0)
    assert(row.getString(1) === "100")
  }

  test("empty-input guard returns main unchanged") {
    val empty = staging.limit(0)
    val out = Load.loadGuarded(main, empty, "link")
    assert(out.exceptAll(main).isEmpty && main.exceptAll(out).isEmpty)
  }

  test("jsonl interchange round-trips the array column the CSV hop stringifies") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val df = Seq(
      ("a", Seq("Carport", "Garasi"), Some(100L)),
      ("b", Seq.empty[String], None)).toDF("link", "additional_features", "price_rp")
    val path = Load.datedJsonl(df, "listings", dir, java.time.LocalDate.of(2024, 1, 2))
    assert(path.endsWith("listings_20240102"))
    val back = spark.read.schema(df.schema).json(path)
    val rows = back.collect().map(r => (r.getString(0),
      Option(r.getSeq[String](1)).getOrElse(Seq()), Option(r.get(2)))).toSet
    assert(rows.map(_._1) === Set("a", "b"))
    assert(rows.find(_._1 == "a").get._2 === Seq("Carport", "Garasi"))
    // the array survives as a real array, not a stringified literal
    assert(back.schema("additional_features").dataType.typeName === "array")
  }

  test("jdbcUpsert drives a real JDBC database end-to-end (embedded Derby)") {
    // K2/K3/K6 wire path (SURVEY.md §2.2): truncate-overwrite staging
    // via Spark's batched JDBC writer, then one server-side atomic
    // merge. Derby ships with Spark; its ANSI MERGE has the same
    // semantics as the reference's Postgres ON CONFLICT.
    val url = "jdbc:derby:memory:graftload;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE main_t (link VARCHAR(64) PRIMARY KEY, price_rp BIGINT, name VARCHAR(64))")
      st.execute("CREATE TABLE stg_t (link VARCHAR(64), price_rp BIGINT, name VARCHAR(64))")
      st.execute("INSERT INTO main_t VALUES ('a', 100, 'old-a'), ('b', 200, 'old-b')")
      st.close()
    } finally conn.close()

    val day1 = Seq(("b", 999L, "new-b"), ("c", 300L, "new-c"))
      .toDF("link", "price_rp", "name")
    Load.jdbcUpsert(day1, url, "stg_t", "main_t", "link",
      batchSize = 1, dialect = Load.AnsiMerge)
    // idempotence across re-runs: same staging applied twice = once
    Load.jdbcUpsert(day1, url, "stg_t", "main_t", "link",
      batchSize = 500, dialect = Load.AnsiMerge)

    val got = spark.read.jdbc(url, "main_t", new java.util.Properties)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set(("a", 100L, "old-a"), ("b", 999L, "new-b"), ("c", 300L, "new-c")))

    // the Postgres rendering stays the reference's exact statement shape
    val pg = Load.PostgresOnConflict.mergeSql("main_t", "stg_t",
      Seq("link", "price_rp", "name"), "link")
    assert(pg.contains("ON CONFLICT (link) DO UPDATE SET"))
    assert(pg.contains("price_rp = EXCLUDED.price_rp"))
  }

  test("jdbcExactlyOnce: ledger + transactional merge — redelivery no-ops, failures roll back whole") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    val url = "jdbc:derby:memory:graftxonce;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE main_x (link VARCHAR(64) PRIMARY KEY, price_rp BIGINT)")
      st.execute("CREATE TABLE stg_x (link VARCHAR(64), price_rp BIGINT)")
      st.execute("CREATE TABLE led_x (batch_id BIGINT PRIMARY KEY)")
      st.close()
    } finally conn.close()
    def readMain(): Set[(String, Long)] =
      spark.read.jdbc(url, "main_x", new java.util.Properties)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // first delivery of epoch 7 applies
    assert(StreamingOps.jdbcExactlyOnceBatch(
      Seq(("a", 1L), ("b", 2L)).toDF("link", "price_rp"),
      7L, url, "stg_x", "main_x", "link", "led_x"))
    assert(readMain() === Set(("a", 1L), ("b", 2L)))

    // redelivery of epoch 7 is skipped even with DIFFERENT payload —
    // the ledger, not value idempotence, is what protects the sink
    assert(!StreamingOps.jdbcExactlyOnceBatch(
      Seq(("a", 999L)).toDF("link", "price_rp"),
      7L, url, "stg_x", "main_x", "link", "led_x"))
    assert(readMain() === Set(("a", 1L), ("b", 2L)))

    // next epoch upserts normally
    assert(StreamingOps.jdbcExactlyOnceBatch(
      Seq(("b", 20L), ("c", 3L)).toDF("link", "price_rp"),
      8L, url, "stg_x", "main_x", "link", "led_x"))
    assert(readMain() === Set(("a", 1L), ("b", 20L), ("c", 3L)))

    // atomicity: a merge that fails mid-statement (duplicate source
    // keys violate main's PRIMARY KEY on the NOT MATCHED inserts)
    // rolls back WITH its ledger insert — the epoch stays unrecorded,
    // main stays untouched, and the fixed redelivery then applies
    intercept[java.sql.SQLException] {
      StreamingOps.jdbcExactlyOnceBatch(
        Seq(("d", 4L), ("d", 5L)).toDF("link", "price_rp"),
        9L, url, "stg_x", "main_x", "link", "led_x")
    }
    assert(readMain() === Set(("a", 1L), ("b", 20L), ("c", 3L)),
      "a failed merge must leave the main table untouched")
    assert(StreamingOps.jdbcExactlyOnceBatch(
      Seq(("d", 4L)).toDF("link", "price_rp"),
      9L, url, "stg_x", "main_x", "link", "led_x"),
      "the failed epoch must not have been recorded in the ledger")
    assert(readMain() === Set(("a", 1L), ("b", 20L), ("c", 3L), ("d", 4L)))
  }

  test("jdbcExactlyOnce: streaming drive — AvailableNow drains across restarts upsert once each") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import org.apache.spark.sql.streaming.Trigger
    val url = "jdbc:derby:memory:graftxstream;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE main_s (link VARCHAR(64) PRIMARY KEY, price_rp BIGINT)")
      st.execute("CREATE TABLE stg_s (link VARCHAR(64), price_rp BIGINT)")
      st.execute("CREATE TABLE led_s (batch_id BIGINT PRIMARY KEY)")
      st.close()
    } finally conn.close()
    val dir = java.nio.file.Files.createTempDirectory("graft_xstream").toString
    val landing = s"$dir/landing"
    def land(rows: Seq[(String, Long)]): Unit =
      rows.toDF("link", "price_rp").write.mode("append").parquet(landing)
    def drain(): Unit = {
      val schema = spark.read.parquet(landing).schema
      val stream = spark.readStream.schema(schema).parquet(landing)
      val q = StreamingOps.jdbcExactlyOnce(stream, url, "stg_s", "main_s",
          "link", "led_s", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def readMain(): Set[(String, Long)] =
      spark.read.jdbc(url, "main_s", new java.util.Properties)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    land(Seq(("a", 1L), ("b", 2L))); drain()
    assert(readMain() === Set(("a", 1L), ("b", 2L)))
    // restart on the same checkpoint: only NEW files drain; the upsert
    // revises b and adds c exactly once
    land(Seq(("b", 20L), ("c", 3L))); drain()
    assert(readMain() === Set(("a", 1L), ("b", 20L), ("c", 3L)))
    // a third restart with nothing new applies nothing (ledger rows =
    // committed epochs, no duplicates)
    drain()
    assert(readMain() === Set(("a", 1L), ("b", 20L), ("c", 3L)))
    val ledger = spark.read.jdbc(url, "led_s", new java.util.Properties)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ledger === ledger.distinct, "ledger must hold each epoch once")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("schema evolution: mergeSchema unions file batches, missing columns read NULL") {
    // a long-lived landing zone accumulates batches written by
    // different pipeline versions; the engine must read them as one
    // table with the unioned schema — additive evolution, no rewrite
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    try {
      Seq(("a", 100L)).toDF("link", "price_rp")
        .write.mode("append").parquet(dir)
      Seq(("b", 200L, "agent-x")).toDF("link", "price_rp", "listed_by")
        .write.mode("append").parquet(dir)
      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(merged.columns.sorted.toSeq === Seq("link", "listed_by", "price_rp"))
      val rows = merged.collect()
        .map(r => (r.getAs[String]("link"), r.getAs[Long]("price_rp"),
          Option(r.getAs[String]("listed_by")))).toSet
      assert(rows === Set(("a", 100L, None), ("b", 200L, Some("agent-x"))))
      // without mergeSchema the footer picked can hide the new column —
      // the gotcha that makes the option (or a table format) mandatory
      // for evolving landing zones; column ORDER is footer-dependent
      // either way, so consumers must select by name
      val plain = spark.read.parquet(dir)
      assert(plain.columns.length <= merged.columns.length)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
