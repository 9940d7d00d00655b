package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink layer: the reference's load stage (reference src/load.py:46-96)
  * — truncate staging, batched insert, atomic `INSERT … ON CONFLICT
  * (link) DO UPDATE` merge (src/load.py:30-43) — re-expressed two ways:
  *
  *  1. [[merge]]: the upsert as a distributed DataFrame operation
  *     (full-outer join + per-column coalesce, staging wins). This is
  *     the lake-native semantics (what Delta `MERGE INTO` plans) and is
  *     what the DuckDB oracle checks.
  *  2. [[jdbcUpsert]]: the reference's exact staging+merge wire pattern
  *     for a live Postgres, compile-ready but unused in this offline
  *     environment (no JDBC endpoint to test against).
  *
  * Scale note: the merge join shuffles both sides on the key once; with
  * a bucketed/partitioned main table the staging side (daily delta,
  * small) would broadcast instead — at 100 TB the main table is never
  * rewritten wholesale, only co-partitioned merge output partitions.
  */
object Load {

  /** Upsert `staging` into `main` keyed on `key`: matched keys take the
    * staging row wholesale (last-writer-wins full-row update, reference
    * src/load.py:37 — NULLs in staging overwrite too, so this switches
    * on key presence, not per-column coalesce), unmatched staging rows
    * insert, unmatched main rows persist. Inputs must share a schema.
    *
    * Precondition: `staging` must have at most one row per `key` (the
    * full-outer join duplicates the main row otherwise, diverging from
    * the reference's sequential last-writer-wins). Callers with raw
    * multi-occurrence batches dedup first — see
    * [[graft.streaming.StreamingOps.upsertEachBatch]]. */
  def merge(main: DataFrame, staging: DataFrame, key: String): DataFrame = {
    val cols = main.columns.toSeq
    require(staging.columns.toSeq == cols, "merge requires identical schemas")
    val m = main.as("m")
    // NULL-key staging rows can never match (and the reference's link
    // PRIMARY KEY would reject them); unfiltered they'd emit phantom
    // all-NULL rows through the key-presence switch below. The F1
    // null-key filter runs upstream in the pipeline; enforce here too.
    val s = staging.filter(col(key).isNotNull).as("s")
    val picked: Seq[Column] = cols.map(c =>
      when(col(s"s.$key").isNotNull, col(s"s.$c")).otherwise(col(s"m.$c")).as(c))
    m.join(s, col(s"m.$key") === col(s"s.$key"), "full_outer").select(picked: _*)
  }

  /** The reference's inserted-count metric (src/load.py:41-43, Postgres
    * `RETURNING xmax = 0`): staging keys not present in main. */
  def insertedCount(main: DataFrame, staging: DataFrame, key: String): DataFrame =
    staging.filter(col(key).isNotNull).join(main, Seq(key), "left_anti")
      .agg(count(lit(1)).as("n_inserted"))

  /** Empty-input guard (reference src/load.py:72-74). */
  def loadGuarded(main: DataFrame, staging: DataFrame, key: String): DataFrame =
    if (staging.isEmpty) main else merge(main, staging, key)

  /** SCD2 (history-keeping) merge: the warehouse-grade extension of the
    * reference's last-writer-wins upsert. `current` carries validity
    * columns (`valid_from`, `valid_to` with NULL = open); `staging`
    * carries bare attribute rows. Changed keys close their open version
    * at `batchTs` and append a new open one; unchanged keys pass
    * through; new keys open at `batchTs`; closed history is untouched.
    * Change detection is null-safe per-column equality. One full-outer
    * join on the key — same shuffle profile as [[merge]]. */
  def scd2Merge(current: DataFrame, staging: DataFrame, key: String, batchTs: Long): DataFrame = {
    val attrCols = staging.columns.filterNot(_ == key).toSeq
    val outCols = (key +: attrCols) ++ Seq("valid_from", "valid_to")
    val hist = current.filter(col("valid_to").isNotNull).select(outCols.map(col): _*)
    val open = current.filter(col("valid_to").isNull)
    val o = open.as("o")
    val s = staging.filter(col(key).isNotNull).as("s")
    val j = o.join(s, col(s"o.$key") === col(s"s.$key"), "full_outer")
    // foldLeft, not reduce: a key-only staging schema (no attribute
    // columns) means nothing can change
    val changed = attrCols.map(c => !(col(s"o.$c") <=> col(s"s.$c")))
      .foldLeft(lit(false))(_ || _)

    // Single pass: each joined row emits 1-2 output rows via an array
    // explode — three filtered unions over `j` would recompute the
    // join (and everything under it) three times.
    def rowStruct(side: String, from: Column, to: Column): Column =
      struct((col(s"$side.$key").as(key) +: attrCols.map(c => col(s"$side.$c").as(c))) ++
        Seq(from.as("valid_from"), to.cast("bigint").as("valid_to")): _*)
    val keepS   = rowStruct("o", col("o.valid_from"), col("o.valid_to"))
    val closedS = rowStruct("o", col("o.valid_from"), lit(batchTs))
    val openS   = rowStruct("s", lit(batchTs), lit(null))
    val emitted = j.select(explode(
      when(col(s"s.$key").isNull, array(keepS))
        .when(col(s"o.$key").isNull, array(openS))
        .when(changed, array(closedS, openS))
        .otherwise(array(keepS))).as("r"))
      .select(col("r.*"))
    hist.unionByName(emitted)
  }

  /** Point-in-time (time-travel) read over an SCD2 table: the version
    * of each key valid AT `ts` — `valid_from ≤ ts < valid_to` with
    * NULL `valid_to` meaning open. A narrow filter, so at scale it
    * rides predicate pushdown into the dimension scan; pair with the
    * history-keeping [[scd2Merge]] for reproducible as-of joins
    * (rebuilding yesterday's feature table against yesterday's
    * dimension state). */
  def scd2AsOf(scd2: DataFrame, ts: Long): DataFrame =
    scd2.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))

  /** Server-side upsert statement renderings. The reference speaks
    * Postgres `ON CONFLICT` (src/load.py:33-39); `AnsiMerge` is the
    * standard `MERGE INTO` equivalent (Derby, DB2, SQL Server, modern
    * warehouses) — same semantics, which lets the wire path be
    * exercised against the embedded Derby shipped with Spark. */
  sealed trait MergeDialect {
    def mergeSql(main: String, staging: String, cols: Seq[String], key: String): String
  }
  object PostgresOnConflict extends MergeDialect {
    def mergeSql(main: String, staging: String, cols: Seq[String], key: String): String = {
      val colList = cols.mkString(", ")
      val updates = cols.filterNot(_ == key)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"""INSERT INTO $main ($colList)
         |SELECT $colList FROM $staging
         |ON CONFLICT ($key) DO UPDATE SET $updates""".stripMargin
    }
  }
  object AnsiMerge extends MergeDialect {
    def mergeSql(main: String, staging: String, cols: Seq[String], key: String): String = {
      val updates = cols.filterNot(_ == key).map(c => s"$c = s.$c").mkString(", ")
      s"""MERGE INTO $main m USING $staging s ON m.$key = s.$key
         |WHEN MATCHED THEN UPDATE SET $updates
         |WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
         |  VALUES (${cols.map(c => s"s.$c").mkString(", ")})""".stripMargin
    }
  }

  /** Reference wire pattern for a live RDBMS: overwrite-truncate the
    * staging table via JDBC (batched per partition, reference
    * src/load.py:13-27 batches 500 rows — Spark's JDBC writer batches
    * with `batchsize` per partition, in parallel), then issue the
    * server-side atomic merge statement from the driver. Tested
    * end-to-end against embedded Derby (LoadSpec) with the ANSI MERGE
    * rendering; the Postgres rendering is byte-for-byte the reference's
    * statement shape. */
  /** Truncate-overwrite the staging table via Spark's batched JDBC
    * writer — THE one copy of the staging-write protocol, shared by
    * [[jdbcUpsert]] and the streaming exactly-once sink
    * ([[graft.streaming.StreamingOps.jdbcExactlyOnceBatch]]) so a
    * staging-side change (credentials, isolation, batch shape) cannot
    * silently diverge between the two paths. */
  def stageOverwrite(df: DataFrame, url: String, stagingTable: String,
                     batchSize: Int, props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("truncate", "true")
      .option("batchsize", batchSize.toString)
      .jdbc(url, stagingTable, props)

  def jdbcUpsert(df: DataFrame, url: String, stagingTable: String,
                 mainTable: String, key: String, batchSize: Int = 500,
                 props: java.util.Properties = new java.util.Properties,
                 dialect: MergeDialect = PostgresOnConflict): Unit = {
    stageOverwrite(df, url, stagingTable, batchSize, props)
    val mergeSql = dialect.mergeSql(mainTable, stagingTable, df.columns.toSeq, key)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try { val st = conn.createStatement(); try st.execute(mergeSql) finally st.close() }
    finally conn.close()
  }

  /** Dated CSV sink (reference utils/helper.py:42-63): header row, date
    * suffix computed at the driver. */
  def datedCsv(df: DataFrame, name: String, dirPath: String, date: java.time.LocalDate): String = {
    val stamp = date.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    val path = s"$dirPath/${name}_$stamp"
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    path
  }

  /** Dated JSON-lines sink: the lossless stage-boundary interchange.
    * The reference's CSV hop stringifies its one array column
    * (SURVEY.md §1 — `additional_features` becomes `"['a', 'b']"`);
    * JSONL round-trips arrays and nulls intact while keeping the same
    * splittable line-per-record layout. */
  def datedJsonl(df: DataFrame, name: String, dirPath: String, date: java.time.LocalDate): String = {
    val stamp = date.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    val path = s"$dirPath/${name}_$stamp"
    df.write.mode(SaveMode.Overwrite).json(path)
    path
  }
}
