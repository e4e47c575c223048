package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface over the engine's event/document model.
 *
 * The reference has NO streaming story (SURVEY §2.12) — this is the
 * green-field part of the engine: the span/text operators are
 * per-document and therefore map-style, so they compose with streaming
 * sources unchanged; what needs streaming-specific machinery is event-time
 * aggregation (watermark + window) and cross-batch state (sessionization
 * via flatMapGroupsWithState). Both are written against plain DataFrames
 * so the SAME code runs in batch (tests, backfills) and streaming.
 *
 * Timestamps: the testdata's `events.ts` is nanosecond epoch (read as
 * long); `withEventTime` derives the proper timestamp column once.
 */
object EventStreams {

  /** Nano-long `ts` → timestamp column `event_time` (micros precision). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /**
   * Tumbling-window counts/sums per event type with a 1-hour watermark —
   * the canonical late-data-tolerant streaming aggregation. In batch mode
   * the watermark is a no-op and this is an ordinary windowed groupBy.
   */
  def hourlyTypeCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /**
   * Stream-stream INTERVAL JOIN: every `typeA` event followed by a
   * `typeB` event of the same user within `withinMinutes`. Both sides
   * carry watermarks and the join condition bounds event-time in both
   * directions, so in streaming mode Spark can expire join state on both
   * sides (an unbounded condition would accumulate state forever); in
   * batch the same plan is an ordinary interval self-join. Timestamps
   * compare at micro precision (the engine's event_time unit).
   * Output: user_id, a_id, b_id, lag_us.
   */
  def correlatedPairs(events: DataFrame, typeA: String, typeB: String,
      withinMinutes: Int = 360, watermark: String = "1 hour"): DataFrame = {
    def side(t: String, p: String) =
      withEventTime(events).filter(col("event_type") === t)
        .withWatermark("event_time", watermark)
        .select(col("user_id").as(s"${p}_user"), col("event_id").as(s"${p}_id"),
          col("event_time").as(s"${p}_time"))
    side(typeA, "a").join(side(typeB, "b"),
        col("a_user") === col("b_user") &&
          col("b_time") > col("a_time") &&
          col("b_time") <= col("a_time") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        (unix_micros(col("b_time")) - unix_micros(col("a_time"))).as("lag_us"))
  }

  /** One user session: closed when `gap` passes with no events. */
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Internal cross-batch state (public: the state encoder codegen needs
    * constructor access). */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)

  /**
   * Event-time sessionization with custom state
   * (`flatMapGroupsWithState`): events within `gapMinutes` of each other
   * merge into one session per user; a session is EMITTED when a later
   * event arrives past the gap, or when the event-time watermark passes
   * its timeout (no more late data possible). This is the stateful-op
   * template for any per-document incremental operator (e.g. streaming
   * span extraction with cross-batch carry-over).
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // In batch mode flatMapGroupsWithState runs each group exactly once and
    // timeouts never fire, so state left behind at end-of-group would be
    // silently dropped — flush the final open session inline instead.
    // (In streaming the group iterator is per-trigger, so there the open
    // session must stay in state and flush via the event-time timeout.)
    val isBatch = !events.isStreaming
    // the watermarked column must survive into the grouped projection for
    // event-time timeouts to resolve
    val typed = withEventTime(events)
      .withWatermark("event_time", s"$gapMinutes minutes")
      .select(col("user_id").cast("long"), expr("ts div 1000").cast("long").as("ts_us"),
        col("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]

    typed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
      (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
          state: GroupState[OpenSession]) => {
        if (rows.isEmpty && state.hasTimedOut) {
          // watermark passed: flush the open session
          val s = state.get
          state.remove()
          Iterator.single(Session(user, s.startUs, s.endUs, s.n))
        } else {
          val sorted = rows.map(_._2).toArray.sorted
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption
          sorted.foreach { t =>
            cur match {
              case Some(s) if t - s.endUs <= gapUs =>
                cur = Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1))
              case Some(s) =>
                closed += Session(user, s.startUs, s.endUs, s.n)
                cur = Some(OpenSession(t, t, 1))
              case None =>
                cur = Some(OpenSession(t, t, 1))
            }
          }
          cur.foreach { s =>
            if (isBatch) closed += Session(user, s.startUs, s.endUs, s.n)
            else {
              state.update(s)
              // flush when no event lands within the gap (event-time clock)
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60L * 1000L)
            }
          }
          closed.iterator
        }
      })
  }
}
