package graft.scheduler

/** J1/J2: the ready-jobs query and the distributed CAS lock
  * (reference: database/job_repository.go:376-410,439-499). Driver-side —
  * jobs are control-plane-small. Virtual times injected, like everything
  * else in the engine.
  */
final case class Job(
    id: String,
    status: String,
    isPaused: Boolean,
    lockToken: Option[String],
    lockedAt: Option[Long],
    nextRunAt: Option[Long],
    immediate: Boolean
)

object JobQueue {
  val ReadyBatchLimit = 100

  /** job_repository.go:376-410: not paused, pending|scheduled, unlocked,
    * due or immediate; immediate-first then next_run_at ASC NULLS LAST;
    * LIMIT 100. Deterministic final tie-break on id.
    */
  def readyJobs(jobs: Seq[Job], now: Long, limit: Int = ReadyBatchLimit): Seq[Job] =
    jobs.filter { j =>
      !j.isPaused &&
      (j.status == JobStateMachine.Pending || j.status == JobStateMachine.Scheduled) &&
      j.lockToken.isEmpty &&
      (j.immediate || j.nextRunAt.exists(_ <= now))
    }.sortBy(j => (!j.immediate, j.nextRunAt.isEmpty,
      j.nextRunAt.getOrElse(Long.MaxValue), j.id))
      .take(limit)

  /** job_repository.go:439-482: compare-and-set — acquire only when
    * unlocked; returns the locked job or None (rows-affected==0).
    */
  def acquireLock(job: Job, token: String, now: Long): Option[Job] =
    if (job.lockToken.isEmpty)
      Some(job.copy(lockToken = Some(token), lockedAt = Some(now)))
    else None

  def releaseLock(job: Job, token: String): Option[Job] =
    if (job.lockToken.contains(token)) Some(job.copy(lockToken = None, lockedAt = None))
    else None

  /** job_repository.go:487-499: stale locks (locked before cutoff) cleared. */
  def clearStaleLocks(jobs: Seq[Job], cutoff: Long): Seq[Job] =
    jobs.map { j =>
      if (j.lockToken.isDefined && j.lockedAt.exists(_ < cutoff))
        j.copy(lockToken = None, lockedAt = None)
      else j
    }
}
