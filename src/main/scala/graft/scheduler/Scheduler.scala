package graft.scheduler

import scala.collection.mutable

/** Driver-side scheduler control plane (SURVEY.md §2.6). Pure Scala — jobs
  * and slots are control-plane-small; the data plane is the frontier.
  * All times are caller-supplied virtual millis (no wall clock, per the
  * engine-wide determinism rule).
  */

/** J3: the 7-state job machine (reference:
  * crawler/internal/scheduler/state_machine.go:12-109).
  */
object JobStateMachine {
  val Pending = "pending"
  val Scheduled = "scheduled"
  val Running = "running"
  val Paused = "paused"
  val Completed = "completed"
  val Failed = "failed"
  val Cancelled = "cancelled"

  private val valid: Map[String, Set[String]] = Map(
    Pending -> Set(Scheduled, Running, Cancelled),
    Scheduled -> Set(Running, Pending, Paused, Cancelled),
    Paused -> Set(Scheduled, Pending, Cancelled),
    Running -> Set(Completed, Failed, Scheduled, Cancelled),
    Completed -> Set(Scheduled),
    Failed -> Set(Pending),
    Cancelled -> Set.empty
  )

  def validate(from: String, to: String): Either[String, Unit] =
    valid.get(from) match {
      case None => Left(s"unknown source state: $from")
      case Some(allowed) =>
        if (allowed.contains(to)) Right(())
        else Left(s"invalid state transition from $from to $to")
    }

  def canPause(status: String): Boolean = status == Scheduled
  def canResume(status: String): Boolean = status == Paused
  def canCancel(status: String): Boolean =
    Set(Scheduled, Running, Paused, Pending).contains(status)
  def canRetry(status: String): Boolean = status == Failed
  def isTerminal(status: String): Boolean =
    Set(Cancelled, Completed, Failed).contains(status)
  def isSchedulable(status: String): Boolean =
    status == Pending || status == Scheduled
}

/** J4: execution retry backoff — base * 2^(attempt-1) capped at 1 h
  * (reference: scheduler/scheduler_execution.go:633-646).
  */
object RetryBackoff {
  val MaxBackoffMs: Long = 60L * 60000L
  def backoffMs(baseMs: Long, attempt: Int): Long = {
    val a = math.max(attempt, 1)
    // Double math avoids the Long overflow wrap for large attempts
    math.min(baseMs.toDouble * math.pow(2.0, (a - 1).toDouble),
      MaxBackoffMs.toDouble).toLong
  }
}

/** J5: adaptive recrawl interval — unchanged content doubles the interval
  * up to 24 h; any change resets to baseline (reference:
  * adaptive/hash_tracker.go:23,58-102).
  */
object AdaptiveInterval {
  val MaxIntervalMs: Long = 24L * 3600000L

  final case class HashState(contentHash: String, unchangedCount: Int)

  /** Returns (nextIntervalMs, newState). */
  def next(baselineMs: Long, state: Option[HashState], newHash: String)
      : (Long, HashState) =
    state match {
      case Some(s) if s.contentHash == newHash =>
        val n = s.unchangedCount + 1
        val interval = math.min(baselineMs * (1L << math.min(n, 62)), MaxIntervalMs)
        (interval, HashState(newHash, n))
      case _ =>
        (baselineMs, HashState(newHash, 0))
    }
}

/** J6: 15-minute-slot load balancing (reference:
  * crawler/internal/scheduler/bucket_map.go). Virtual-time variant: all
  * `now` values injected.
  */
final class BucketMap {
  import BucketMap._

  private val slots = mutable.Map.empty[Long, Int].withDefaultValue(0)
  private val jobToSlot = mutable.Map.empty[String, Long]
  private val lastPlaced = mutable.Map.empty[String, Long]

  def addJob(jobId: String, slotKey: Long, now: Long): Unit = {
    jobToSlot.get(jobId).foreach { old =>
      slots(old) -= 1
      if (slots(old) <= 0) slots.remove(old)
    }
    slots(slotKey) += 1
    jobToSlot(jobId) = slotKey
    lastPlaced(jobId) = now
  }

  def removeJob(jobId: String): Unit =
    jobToSlot.remove(jobId).foreach { slot =>
      slots(slot) -= 1
      if (slots(slot) <= 0) slots.remove(slot)
      lastPlaced.remove(jobId)
    }

  def slotLoad(slotKey: Long): Int = slots(slotKey)
  def jobSlot(jobId: String): Option[Long] = jobToSlot.get(jobId)

  /** Least-loaded slot in [start, end); earliest wins ties
    * (bucket_map.go:104-121).
    */
  def findLeastLoaded(startMs: Long, endMs: Long): Long = {
    var bestSlot = slotKey(startMs)
    var bestLoad = slots(bestSlot)
    var t = startMs
    while (t < endMs) {
      val s = slotKey(t)
      if (slots(s) < bestLoad) { bestLoad = slots(s); bestSlot = s }
      t += SlotMs
    }
    bestSlot
  }

  /** bucket_map.go:126-143: place into the least-loaded slot of the next
    * max(24h, interval) window.
    */
  def placeNewJob(jobId: String, intervalMs: Long, now: Long): Long = {
    val searchMs = math.max(SearchWindowMs, intervalMs)
    val best = findLeastLoaded(now, now + searchMs)
    addJob(jobId, best, now)
    slotTime(best)
  }

  /** bucket_map.go:148-179: rhythm-preserving reschedule — advance the
    * job's current slot by interval/15min slots (min 1).
    */
  def nextRunPreserveRhythm(jobId: String, intervalMs: Long, now: Long): Long =
    jobToSlot.get(jobId) match {
      case None => placeNewJob(jobId, intervalMs, now)
      case Some(cur) =>
        val add = math.max(intervalMs / SlotMs, 1L)
        val next = cur + add
        addJob(jobId, next, now)
        slotTime(next)
    }

  /** bucket_map.go:183-205: move constraints during rebalancing. */
  def canMoveJob(jobId: String, status: String, nextRunAt: Option[Long],
      now: Long): (String, Boolean) = {
    if (status == "running") return ("job_running", false)
    if (nextRunAt.exists(_ - now <= ProtectionWindowMs))
      return ("protection_window", false)
    if (lastPlaced.get(jobId).exists(now - _ < PlacementCooldownMs))
      return ("placement_cooldown", false)
    ("", true)
  }

  /** bucket_map.go:233-294: hourly distribution + score = 1 − normalized
    * variance (floored at 0; empty schedule scores 1).
    */
  def distribution(windowHours: Int, now: Long): (Seq[(Int, Int)], Double) = {
    val hourly = (0 until windowHours).map { h =>
      val hourStart = now + h.toLong * 3600000L
      val count = (0 until 4).map(q => slots(slotKey(hourStart + q * SlotMs))).sum
      h -> count
    }
    val total = hourly.map(_._2).sum
    val score =
      if (total > 0 && windowHours > 0) {
        val ideal = total.toDouble / windowHours
        val variance = hourly.map { case (_, c) =>
          val d = c - ideal; d * d
        }.sum / windowHours
        math.max(1.0 - variance / (ideal * ideal), 0.0)
      } else 1.0
    (hourly, score)
  }

  def clear(): Unit = { slots.clear(); jobToSlot.clear(); lastPlaced.clear() }

  /** Test hook mirroring bucket_map.go:209-213. */
  def setLastPlaced(jobId: String, t: Long): Unit = lastPlaced(jobId) = t
}

object BucketMap {
  val SlotMs: Long = 15L * 60000L
  val ProtectionWindowMs: Long = 30L * 60000L
  val PlacementCooldownMs: Long = 60L * 60000L
  val SearchWindowMs: Long = 24L * 3600000L

  def slotKey(tMs: Long): Long = tMs / 1000L / 900L
  def slotTime(key: Long): Long = key * 900L * 1000L
}
