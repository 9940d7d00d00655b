package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's incremental semantics.
  *
  * The reference is scheduled batch (SURVEY.md §2.9): newest-first
  * bounded scrape + idempotent upsert per run. Its streaming-native
  * re-expression:
  *  - micro-batch upsert = `foreachBatch` + [[graft.etl.Load.merge]]
  *    (the `ON CONFLICT` merge per micro-batch),
  *  - cross-run dedup = `dropDuplicatesWithinWatermark` on the key,
  *  - the event-time operators (tumbling window, session window) as
  *    watermarked streaming aggregations.
  *
  * Scale notes: all state here is keyed and watermark-bounded — state
  * store size is O(active keys in watermark horizon), independent of
  * stream length; shuffles are on the aggregation keys only.
  */
object StreamingOps {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  case class SessionState(start_us: Long, end_us: Long, n: Long)

  /** Watermarked tumbling 5-minute counts per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Native session windows (30-minute gap): the built-in streaming
    * equivalent of the batch lag/cumsum sessionization. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * escape hatch for session logic the built-in window can't express
    * (here: emit count + exact first/last event time per session).
    * Event-time timeout keyed on the watermark closes idle sessions. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start_us, s.end_us, s.n))
          } else {
            val sorted = evs.map(e => (e.ts.getTime * 1000L, e)).toSeq.sortBy(_._1)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { case (us, _) =>
              cur match {
                case Some(s) if us - s.end_us <= gapUs =>
                  cur = Some(s.copy(end_us = us, n = s.n + 1))
                case Some(s) =>
                  closed += Session(user, s.start_us, s.end_us, s.n)
                  cur = Some(SessionState(us, us, 1))
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_us / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming cross-run dedup on a key (the reference's re-scrape
    * collapse, SURVEY.md §2.4 D2) with watermark-bounded state. */
  def dedupByKey(df: DataFrame, key: String, tsCol: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(key)

  /** Micro-batch upsert: the reference's staging+merge load applied per
    * micro-batch (`Trigger.AvailableNow` over a landing directory gives
    * exactly the reference's idempotent daily-batch semantics). The
    * target is maintained as a parquet dir swapped atomically via
    * temp-dir rename. */
  def upsertEachBatch(spark: SparkSession, stream: DataFrame, key: String,
                      targetDir: String, checkpointDir: String) = {
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val target = new java.io.File(targetDir)
        val merged =
          if (target.exists()) graft.etl.Load.merge(spark.read.parquet(targetDir), batch, key)
          else batch
        val tmp = targetDir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val old = new java.io.File(targetDir + ".old")
        org.apache.commons.io.FileUtils.deleteQuietly(old)
        if (target.exists()) target.renameTo(old)
        new java.io.File(tmp).renameTo(target)
        org.apache.commons.io.FileUtils.deleteQuietly(old)
        ()
      }
  }
}
