package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated star schema
  * (`/root/testdata/sf*`; see TESTDATA.md). All operators read through
  * here so scan options stay in one place.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed tables
  * behind a catalog; the reads stay identical (`spark.read.parquet` →
  * columnar scan with predicate pushdown + partition pruning). Nothing
  * here materializes or collects.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts has shipped in two physical forms across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects, so it is read as a nanosecond long via the nanosAsLong
    * legacy flag and rebuilt — and plain TIMESTAMP(MICROS), which Spark
    * reads natively as TIMESTAMP_NTZ. Normalize both to a session-zone
    * TimestampType so every event-time operator (and the DuckDB oracle,
    * which reads the same file as a naive microsecond timestamp; the
    * session zone is pinned to UTC in [[GraftSession.local]]) sees
    * identical wall-clock values regardless of the file's vintage.
    *
    * The nanosAsLong flag is normally pinned at session build
    * ([[GraftSession.local]]) so behavior doesn't depend on read order;
    * the set here is a defensive fallback for externally-built
    * sessions. It is session-wide by necessity — the scan re-reads it
    * at execution time, so a set-and-restore around this call would
    * break the returned (lazy) DataFrame. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→Timestamp branch reinterprets the naive wall-clock in the
    // SESSION zone; it is only oracle-correct (DuckDB reads the same
    // file as a naive timestamp) when that zone is UTC. GraftSession
    // pins it; an externally-built session in another zone would
    // silently shift every event — fail loudly instead.
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events() needs spark.sql.session.timeZone=UTC (got '$tz'): " +
        "the TIMESTAMP_NTZ cast reinterprets wall-clock in the session zone")
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long vintage: truncate to micros
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType => // NTZ vintage: reinterpret wall-clock in UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => // a malformed vintage must fail fast, not null-cast
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other " +
            "(expected TIMESTAMP(NANOS) as long, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
