package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.8 — Structured Streaming surfaces over the events stream shape
  * (user_id, event_id, event_type, ts, value): the streaming forms of
  * the batch analytics the engine exposes (q26 windows, q32 upsert
  * view), built the idiomatic way — `readStream` → watermark → windowed
  * aggregation, and `flatMapGroupsWithState` for session state the
  * built-in operators cannot express.
  *
  * Everything here is source-agnostic: callers hand any streaming
  * Dataset[StreamEvent] (file stream over the events parquet directory,
  * Kafka, MemoryStream in tests) and write with their own trigger; at
  * cluster scale the shuffle keys (event_type×window, user_id) are the
  * partitioning, and the watermark bounds state.
  */
object EventStream {

  final case class StreamEvent(
      user_id: Long,
      event_id: Long,
      event_type: String,
      ts: java.sql.Timestamp,
      value: Double)

  final case class SessionUpdate(
      user_id: Long,
      session_start: Long, // epoch millis
      session_end: Long,
      n_events: Long,
      total_value: Double)

  // NOT private: the state encoder's generated code must construct it
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Watermarked tumbling-window counts/sums per event type — the
    * streaming q26. Late rows beyond the watermark are dropped and the
    * window state is finalized (Append mode emits exactly-once finalized
    * windows).
    */
  def windowedStats(
      events: Dataset[StreamEvent],
      watermarkDelay: String = "2 hours",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("val"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("cnt"), col("val"))

  /** Streaming exact dedup — the URL-seen / content-hash semantics in
    * Structured Streaming form: the FIRST row per key passes, duplicates
    * arriving within the watermark horizon are dropped, and the key's
    * state is evicted once the watermark passes (bounded state — the
    * streaming analog of the crawl's seen-filter story, with the
    * watermark as its TTL). Built on the native
    * `dropDuplicatesWithinWatermark` operator, so the dedup state is
    * watermark-managed by the engine rather than hand-rolled in
    * `mapGroupsWithState`.
    */
  def dedupByKey(
      events: Dataset[StreamEvent],
      watermarkDelay: String = "2 hours"): Dataset[StreamEvent] =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user session windows via flatMapGroupsWithState with event-time
    * timeout: a session closes after `gapMs` of event-time silence
    * (watermark-driven), emitting one summary row. Custom state the
    * built-in window operator cannot express — the preferred escape
    * hatch before custom physical operators.
    */
  def sessionize(
      events: Dataset[StreamEvent],
      gapMs: Long,
      watermarkDelay: String = "2 hours"): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[StreamEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.start, s.last, s.n, s.total))
          } else {
            // fold this micro-batch's rows into the session; CLOSE the
            // previous session if the gap was exceeded inside the batch
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += SessionUpdate(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
      }
  }
}
