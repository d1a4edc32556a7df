package graft.scheduler

import org.scalatest.funsuite.AnyFunSuite

/** Pins the control-plane semantics to the reference's tests
  * (scheduler/state_machine_test.go, bucket_map_test.go,
  * scheduler_execution.go:633-646, adaptive/hash_tracker.go:58-102).
  */
class SchedulerSpec extends AnyFunSuite {
  import JobStateMachine._

  test("state machine: valid transition table") {
    assert(validate(Pending, Scheduled).isRight)
    assert(validate(Pending, Running).isRight)
    assert(validate(Scheduled, Running).isRight)
    assert(validate(Scheduled, Pending).isRight) // force-run
    assert(validate(Running, Completed).isRight)
    assert(validate(Running, Scheduled).isRight) // retry with backoff
    assert(validate(Completed, Scheduled).isRight) // recurring reschedule
    assert(validate(Failed, Pending).isRight) // manual retry
    // invalid ones
    assert(validate(Pending, Completed).isLeft)
    assert(validate(Completed, Running).isLeft)
    assert(validate(Cancelled, Pending).isLeft)
    assert(validate("bogus", Pending).isLeft)
  }

  test("state machine predicates") {
    assert(canPause(Scheduled) && !canPause(Running))
    assert(canResume(Paused) && !canResume(Scheduled))
    assert(canCancel(Running) && !canCancel(Completed))
    assert(canRetry(Failed) && !canRetry(Completed))
    assert(isTerminal(Cancelled) && isTerminal(Completed) && isTerminal(Failed))
    assert(isSchedulable(Pending) && isSchedulable(Scheduled) && !isSchedulable(Paused))
  }

  test("retry backoff: base*2^(n-1) capped at 1h") {
    assert(RetryBackoff.backoffMs(60000, 1) == 60000)
    assert(RetryBackoff.backoffMs(60000, 3) == 240000)
    assert(RetryBackoff.backoffMs(60000, 10) == RetryBackoff.MaxBackoffMs)
    assert(RetryBackoff.backoffMs(60000, 100) == RetryBackoff.MaxBackoffMs)
  }

  test("adaptive interval: doubles on unchanged, caps at 24h, resets on change") {
    val base = 3600000L // 1h
    val (i1, s1) = AdaptiveInterval.next(base, None, "h1")
    assert(i1 == base && s1.unchangedCount == 0)
    val (i2, s2) = AdaptiveInterval.next(base, Some(s1), "h1")
    assert(i2 == 2 * base && s2.unchangedCount == 1)
    val (i3, s3) = AdaptiveInterval.next(base, Some(s2), "h1")
    assert(i3 == 4 * base && s3.unchangedCount == 2)
    val many = (1 to 10).foldLeft((0L, s3)) { case ((_, s), _) =>
      AdaptiveInterval.next(base, Some(s), "h1")
    }
    assert(many._1 == AdaptiveInterval.MaxIntervalMs)
    val (ir, sr) = AdaptiveInterval.next(base, Some(many._2), "h2")
    assert(ir == base && sr.unchangedCount == 0)
  }

  test("bucket map: placement, least-loaded search, earliest tie-break") {
    val b = new BucketMap
    val now = 1700000000000L
    val t1 = b.placeNewJob("j1", BucketMap.SlotMs, now)
    val t2 = b.placeNewJob("j2", BucketMap.SlotMs, now)
    // j2 avoids j1's slot (least-loaded, earliest tie-break)
    assert(t1 != t2)
    assert(b.slotLoad(BucketMap.slotKey(t1)) == 1)
    assert(b.jobSlot("j1").isDefined)
    b.removeJob("j1")
    assert(b.jobSlot("j1").isEmpty)
  }

  test("bucket map: rhythm-preserving reschedule advances by interval slots") {
    val b = new BucketMap
    val now = 1700000000000L
    b.addJob("j1", 100L, now)
    val next = b.nextRunPreserveRhythm("j1", 4 * BucketMap.SlotMs, now)
    assert(BucketMap.slotKey(next) == 104L)
    // sub-slot intervals advance at least one slot
    val next2 = b.nextRunPreserveRhythm("j1", 1000L, now)
    assert(BucketMap.slotKey(next2) == 105L)
  }

  test("bucket map: move constraints (running / protection / cooldown)") {
    val b = new BucketMap
    val now = 1700000000000L
    assert(b.canMoveJob("x", "running", None, now) == ("job_running", false))
    assert(b.canMoveJob("x", "scheduled",
      Some(now + BucketMap.ProtectionWindowMs - 1), now) ==
      ("protection_window", false))
    b.addJob("x", 1L, now)
    assert(b.canMoveJob("x", "scheduled", Some(now + 10 * BucketMap.ProtectionWindowMs),
      now + 1) == ("placement_cooldown", false))
    b.setLastPlaced("x", now - BucketMap.PlacementCooldownMs - 1)
    assert(b.canMoveJob("x", "scheduled", Some(now + 10 * BucketMap.ProtectionWindowMs),
      now)._2)
  }

  test("bucket map: distribution score is 1 for even spread, lower for spikes") {
    val b = new BucketMap
    val now = BucketMap.slotTime(BucketMap.slotKey(1700000000000L)) // slot-aligned
    (0 until 4).foreach(h => b.addJob(s"j$h", BucketMap.slotKey(now + h * 3600000L), now))
    val (_, even) = b.distribution(4, now)
    assert(math.abs(even - 1.0) < 1e-9)
    val b2 = new BucketMap
    (0 until 4).foreach(i => b2.addJob(s"k$i", BucketMap.slotKey(now), now))
    val (_, spike) = b2.distribution(4, now)
    assert(spike < even)
    val (_, empty) = new BucketMap().distribution(4, now)
    assert(empty == 1.0)
  }
}
