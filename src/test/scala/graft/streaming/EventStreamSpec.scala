package graft.streaming

import graft.SparkTestBase
// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** §2.8 streaming semantics, driven with MemoryStream micro-batches:
  * watermark finalization for windowed aggregates and event-time session
  * state with gap timeout.
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import EventStream._
  import spark.implicits._

  private def ev(user: Long, id: Long, tpe: String, minute: Long,
      value: Double): StreamEvent =
    StreamEvent(user, id, tpe,
      new java.sql.Timestamp(minute * 60000L), value)

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.processAllAvailable()

  test("windowedStats: watermark finalizes windows, drops late rows") {
    val in = MemoryStream[StreamEvent](spark)
    val q = windowedStats(in.toDS(), watermarkDelay = "10 minutes",
        windowLength = "30 minutes")
      .writeStream.format("memory").queryName("wstats")
      .outputMode(OutputMode.Append()).start()
    // batch 1: two purchases in window [0, 30)
    in.addData(ev(1, 1, "purchase", 5, 10.0), ev(2, 2, "purchase", 10, 5.0))
    drain(q)
    // nothing finalized yet: watermark = 10:00 - 10min < window end 30:00
    assert(spark.table("wstats").count() == 0)
    // batch 2: an event at minute 50 pushes the watermark to 40:00,
    // past the window end → [0,30) finalizes with its two purchases
    in.addData(ev(1, 3, "view", 50, 1.0))
    drain(q)
    // batch 3: a LATE purchase at minute 7 — behind the watermark, into
    // an already-finalized window — must be dropped
    in.addData(ev(3, 4, "purchase", 7, 99.0))
    drain(q)
    val rows = spark.table("wstats").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(rows.toSet == Set((0L, "purchase", 2L, 15.0)))
    q.stop()
  }

  test("dedupByKey: first row wins, in-horizon duplicates drop, state evicts") {
    val in = MemoryStream[StreamEvent](spark)
    val q = EventStream.dedupByKey(in.toDS(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    // batch 1: id 100 twice in one batch (value marks which row) + id 101
    in.addData(ev(1, 100, "purchase", 60, 1.0), ev(2, 100, "purchase", 61, 2.0),
      ev(1, 101, "view", 62, 3.0))
    drain(q)
    // batch 2: id 100 again within the horizon -> dropped
    in.addData(ev(3, 100, "purchase", 65, 4.0))
    drain(q)
    val got1 = spark.table("dedup").collect()
      .map(r => (r.getLong(1), r.getDouble(4))).toSet
    assert(got1 == Set((100L, 1.0), (101L, 3.0)),
      s"first occurrence per key only: $got1")
    // batch 3: advance the watermark far past id 100's state, then
    // re-submit it -> state was evicted, the key is admitted again (the
    // documented within-watermark contract = the seen-TTL analog)
    in.addData(ev(9, 999, "view", 600, 0.0))
    drain(q)
    in.addData(ev(4, 100, "purchase", 601, 5.0))
    drain(q)
    val got2 = spark.table("dedup").collect()
      .map(r => (r.getLong(1), r.getDouble(4))).toSet
    assert(got2.contains((100L, 5.0)), s"post-eviction re-admission: $got2")
    q.stop()
  }

  test("sessionize: gap splits sessions in-batch; timeout closes across batches") {
    val in = MemoryStream[StreamEvent](spark)
    val q = sessionize(in.toDS(), gapMs = 10 * 60000L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    // user 1: events at minutes 60, 65 (one session), then 90 (gap >
    // 10min → the first session closes inside the batch). Timeline sits
    // an hour past the epoch so no row collides with the initial
    // watermark value of 0.
    def m(x: Long) = x * 60000L
    in.addData(ev(1, 1, "view", 60, 1.0), ev(1, 2, "view", 65, 2.0),
      ev(1, 3, "view", 90, 3.0))
    drain(q)
    val closed1 = spark.table("sessions").as[SessionUpdate].collect()
    assert(closed1.toSeq == Seq(SessionUpdate(1, m(60), m(65), 2, 3.0)))
    // another user's much-later event advances the watermark far past
    // user 1's timeout (90min + gap) → the open session times out
    in.addData(ev(2, 4, "view", 240, 1.0))
    drain(q)
    val all = spark.table("sessions").as[SessionUpdate].collect()
    assert(all.exists(s => s.user_id == 1 &&
      s.session_start == m(90) && s.n_events == 1 && s.total_value == 3.0))
    q.stop()
  }
}
