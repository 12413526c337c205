package graft.api

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}

/**
 * Job scheduler: interval and one-shot date triggers over persisted jobs,
 * mirroring the reference's scheduling surface (reference:
 * src/etl_core/scheduling/scheduler_service.py:190-303,
 * persistence/configs/schedule_config.py:41-181 — APScheduler
 * interval/cron/date; cron is intentionally out of scope here, interval +
 * date cover the reference's own test corpus). Executions run through the
 * registry, so every fire produces a normal ExecutionRecord with retries
 * and metrics. Spark-cluster note: scheduling is driver-side control
 * flow only — the triggered work is ordinary distributed jobs.
 */
final class Scheduler(registry: ControlPlane.JobRegistry) {

  final case class Schedule(id: String, jobId: String, kind: String,
                            everyMs: Long, future: ScheduledFuture[_])

  private val pool = Executors.newScheduledThreadPool(1, r => {
    val t = new Thread(r, "graft-scheduler"); t.setDaemon(true); t
  })
  private val schedules = new java.util.concurrent.ConcurrentHashMap[String, Schedule]()
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  private def fire(jobId: String): Unit =
    try registry.execute(jobId)
    catch { case _: Exception => () } // failures live in the execution record

  /** Run `jobId` every `everyMs` (first fire after one interval). */
  def scheduleInterval(jobId: String, everyMs: Long): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    val f = pool.scheduleAtFixedRate(() => fire(jobId), everyMs, everyMs,
      TimeUnit.MILLISECONDS)
    val s = Schedule(s"sched-${seq.incrementAndGet()}", jobId, "interval", everyMs, f)
    schedules.put(s.id, s)
    s
  }

  /** Run `jobId` once after `delayMs` (date trigger). */
  def scheduleOnce(jobId: String, delayMs: Long): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    val runnable: Runnable = () => fire(jobId)
    val f = pool.schedule(runnable, delayMs, TimeUnit.MILLISECONDS)
    val s = Schedule(s"sched-${seq.incrementAndGet()}", jobId, "date", delayMs, f)
    schedules.put(s.id, s)
    s
  }

  def list(): Seq[Schedule] = {
    import scala.jdk.CollectionConverters._
    schedules.values.asScala.toSeq.sortBy(_.id)
  }

  def cancel(id: String): Boolean = Option(schedules.remove(id)) match {
    case Some(s) => s.future.cancel(false); true
    case None    => false
  }

  def shutdown(): Unit = { pool.shutdownNow(); () }
}
