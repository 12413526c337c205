package graft.api

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import java.nio.file.{Files, Path}
import graft.util.JsonStr.quote

/**
 * Job scheduler: interval, one-shot date, and cron triggers over persisted
 * jobs, mirroring the reference's scheduling surface (reference:
 * src/etl_core/scheduling/scheduler_service.py:190-303,
 * persistence/configs/schedule_config.py:41-181 — APScheduler
 * interval/cron/date). Executions run through the registry, so every fire
 * produces a normal ExecutionRecord with retries and metrics.
 *
 * With a `storeDir` the schedule specs persist to `schedules.jsonl`
 * (one JSON object per line, tombstones for cancels) and re-arm on
 * construction — matching the reference, where schedules live in a table
 * and resume on service start. Spark-cluster note: scheduling is
 * driver-side control flow only — the triggered work is ordinary
 * distributed jobs.
 */
final class Scheduler(registry: ControlPlane.JobRegistry,
                      storeDir: Option[Path] = None) {

  /** `arg` is everyMs for interval, delayMs for date, the expression for
    * cron. Cron fires re-arm themselves, replacing `future` in place. */
  final case class Schedule(id: String, jobId: String, kind: String, arg: String,
                            @transient future: ScheduledFuture[_]) {
    def everyMs: Long = if (kind == "cron") -1L else arg.toLong
  }

  private val pool = Executors.newScheduledThreadPool(1, r => {
    val t = new Thread(r, "graft-scheduler"); t.setDaemon(true); t
  })
  private val schedules = new java.util.concurrent.ConcurrentHashMap[String, Schedule]()
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  private def log: Option[Path] = storeDir.map(_.resolve("schedules.jsonl"))

  locally { // re-arm persisted schedules (last writer per id wins)
    log.filter(Files.exists(_)).foreach { p =>
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      val last = scala.collection.mutable.LinkedHashMap[String, Option[(String, String, String)]]()
      Files.readAllLines(p).forEach { line =>
        if (line.nonEmpty) {
          val j = org.json4s.jackson.JsonMethods.parse(line)
          val id = (j \ "id").extract[String]
          if ((j \ "cancelled").extractOpt[Boolean].contains(true)) last(id) = None
          else last(id) = Some(((j \ "job_id").extract[String],
            (j \ "kind").extract[String], (j \ "arg").extract[String]))
        }
      }
      seq.set(last.keys.flatMap(_.split('-').lastOption.flatMap(_.toLongOption))
        .foldLeft(0L)(math.max))
      last.foreach {
        case (id, Some((jobId, kind, arg))) if registry.getJob(jobId).isDefined =>
          kind match {
            case "interval" => arm(id, jobId, kind, arg,
              pool.scheduleAtFixedRate(() => fire(jobId), arg.toLong, arg.toLong,
                TimeUnit.MILLISECONDS))
            case "cron"     => armCron(id, jobId, Cron.parse(arg), arg)
            case _          => () // one-shot date triggers do not survive restart
          }
        case _ => ()
      }
    }
  }

  private def fire(jobId: String): Unit =
    try registry.execute(jobId)
    catch { case _: Exception => () } // failures live in the execution record

  private def persist(s: Schedule): Unit =
    log.foreach(p => Files.writeString(p,
      s"""{"id":${quote(s.id)},"job_id":${quote(s.jobId)},"kind":${quote(s.kind)},"arg":${quote(s.arg)}}""" + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND))
  private def persistCancel(id: String): Unit =
    log.foreach(p => Files.writeString(p,
      s"""{"id":${quote(id)},"cancelled":true}""" + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND))

  private def arm(id: String, jobId: String, kind: String, arg: String,
                  f: ScheduledFuture[_]): Schedule = {
    val s = Schedule(id, jobId, kind, arg, f)
    schedules.put(id, s)
    s
  }

  /** Arm the next cron fire; each fire executes then re-arms itself. */
  private def armCron(id: String, jobId: String, cron: Cron, expr: String): Schedule = {
    val delay = cron.nextAfterMillis(System.currentTimeMillis())
    val runnable: Runnable = () => {
      fire(jobId)
      if (schedules.containsKey(id)) armCron(id, jobId, cron, expr)
    }
    arm(id, jobId, "cron", expr, pool.schedule(runnable, delay, TimeUnit.MILLISECONDS))
  }

  private def nextId(): String = s"sched-${seq.incrementAndGet()}"

  /** Run `jobId` every `everyMs` (first fire after one interval). */
  def scheduleInterval(jobId: String, everyMs: Long): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    val s = arm(nextId(), jobId, "interval", everyMs.toString,
      pool.scheduleAtFixedRate(() => fire(jobId), everyMs, everyMs,
        TimeUnit.MILLISECONDS))
    persist(s)
    s
  }

  /** Run `jobId` once after `delayMs` (date trigger). */
  def scheduleOnce(jobId: String, delayMs: Long): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    val runnable: Runnable = () => fire(jobId)
    val s = arm(nextId(), jobId, "date", delayMs.toString,
      pool.schedule(runnable, delayMs, TimeUnit.MILLISECONDS))
    persist(s)
    s
  }

  /** Run `jobId` on a 5-field cron expression (minute hour dom month dow),
    * e.g. "0-59/5 * * * *". Parsed eagerly so a bad expression fails here. */
  def scheduleCron(jobId: String, expr: String): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    val cron = Cron.parse(expr)
    val s = armCron(nextId(), jobId, cron, expr)
    persist(s)
    s
  }

  def list(): Seq[Schedule] = {
    import scala.jdk.CollectionConverters._
    schedules.values.asScala.toSeq.sortBy(_.id)
  }

  def cancel(id: String): Boolean = Option(schedules.remove(id)) match {
    case Some(s) => s.future.cancel(false); persistCancel(id); true
    case None    => false
  }

  def shutdown(): Unit = { pool.shutdownNow(); () }
}
