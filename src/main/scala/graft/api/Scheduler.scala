package graft.api

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import java.nio.file.{Files, Path}
import graft.util.JsonStr.quote

/**
 * Job scheduler: interval, one-shot date, and cron triggers over persisted
 * jobs, mirroring the reference's scheduling surface (reference:
 * src/etl_core/scheduling/scheduler_service.py:190-303,
 * persistence/configs/schedule_config.py:41-181 — APScheduler
 * interval/cron/date) plus the router's lifecycle verbs
 * (src/etl_core/api/routers/schedules.py:64-137 — pause, resume,
 * update, run-now).
 *
 * THREADING: the timer pool is a single thread that only arms/fires
 * triggers; the actual `registry.execute` runs on a separate worker pool,
 * so one long-running job can never starve another schedule's fire or a
 * cron re-arm (the reference gets the same property from the asyncio
 * loop: jobs are awaitables, the scheduler thread never blocks on them).
 * Cron re-arms the NEXT fire before submitting the current one for the
 * same reason.
 *
 * With a `storeDir` the schedule specs persist to `schedules.jsonl`
 * (one JSON object per line; cancels are tombstones, pause/resume are
 * flag entries, updates are full re-statements — last writer per id wins)
 * and re-arm on construction — matching the reference, where schedules
 * live in a table and resume on service start. A schedule paused before a
 * restart comes back paused. Spark-cluster note: scheduling is
 * driver-side control flow only — the triggered work is ordinary
 * distributed jobs.
 */
final class Scheduler(registry: ControlPlane.JobRegistry,
                      storeDir: Option[Path] = None,
                      workerThreads: Int = 2) {

  /** `arg` is everyMs for interval, delayMs for date, the expression for
    * cron. Cron fires re-arm themselves, replacing `future` in place.
    * A paused schedule keeps its spec but has no armed future. `gen` is
    * the arming GENERATION: every (re-)arm bumps it, and a cron tick
    * re-arms only if the map still holds its own generation — a value
    * comparison (jobId/kind/arg) cannot distinguish an update to the
    * SAME spec, which would leave two live timer chains double-firing. */
  final case class Schedule(id: String, jobId: String, kind: String, arg: String,
                            @transient future: ScheduledFuture[_],
                            paused: Boolean = false, gen: Long = 0L,
                            fired: Boolean = false) {
    def everyMs: Long = if (kind == "cron") -1L else arg.toLong
  }

  private val pool = Executors.newScheduledThreadPool(1, r => {
    val t = new Thread(r, "graft-scheduler"); t.setDaemon(true); t
  })
  // fires run here, never on the timer thread
  private val workers = Executors.newFixedThreadPool(workerThreads.max(1), r => {
    val t = new Thread(r, "graft-scheduler-worker"); t.setDaemon(true); t
  })
  private val schedules = new java.util.concurrent.ConcurrentHashMap[String, Schedule]()
  /** Guards every schedules-map TRANSITION (arm, pause, resume, update,
    * cancel, cron tick re-arm). A cron tick re-arms only when the entry
    * it was armed for is still current — same spec, not paused — so a
    * concurrent pause/update/cancel can never be overwritten by a stale
    * tick, and a tick never fires a job whose schedule just changed. */
  private val stateLock = new Object
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)
  private val genSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def log: Option[Path] = storeDir.map(_.resolve("schedules.jsonl"))

  locally { // re-arm persisted schedules (last writer per id wins)
    log.filter(Files.exists(_)).foreach { p =>
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      // replay: spec lines set/replace the spec, pause/resume lines flip
      // the flag, cancel tombstones drop the id
      val last = scala.collection.mutable.LinkedHashMap[String, Option[(String, String, String)]]()
      val pausedIds = scala.collection.mutable.Set[String]()
      val firedIds = scala.collection.mutable.Set[String]()
      Files.readAllLines(p).forEach { line =>
        if (line.nonEmpty) {
          val j = org.json4s.jackson.JsonMethods.parse(line)
          val id = (j \ "id").extract[String]
          if ((j \ "cancelled").extractOpt[Boolean].contains(true)) {
            last(id) = None; pausedIds -= id; firedIds -= id
          } else if ((j \ "fired").extractOpt[Boolean].contains(true)) {
            firedIds += id
          } else (j \ "paused").extractOpt[Boolean] match {
            case Some(true)  => pausedIds += id
            case Some(false) => pausedIds -= id
            case None =>
              last(id) = Some(((j \ "job_id").extract[String],
                (j \ "kind").extract[String], (j \ "arg").extract[String]))
              firedIds -= id // an update re-states the trigger afresh
          }
        }
      }
      seq.set(last.keys.flatMap(_.split('-').lastOption.flatMap(_.toLongOption))
        .foldLeft(0L)(math.max))
      stateLock.synchronized {
        last.foreach {
          case (id, Some((jobId, kind, arg))) if registry.getJob(jobId).isDefined =>
            if (pausedIds.contains(id))
              schedules.put(id, Schedule(id, jobId, kind, arg, null,
                paused = true, fired = firedIds.contains(id)))
            else kind match {
              case "interval" => armInterval(id, jobId, arg.toLong)
              case "cron"     => armCron(id, jobId, Cron.parse(arg), arg)
              case _          => () // one-shot date triggers do not survive restart
            }
          case _ => ()
        }
      }
    }
  }

  /** Submit the job to the worker pool; the caller (timer thread) returns
    * immediately. Failures live in the execution record. */
  private def fire(jobId: String): Unit = {
    workers.submit(new Runnable {
      def run(): Unit =
        try { registry.execute(jobId); () } catch { case _: Exception => () }
    })
    ()
  }

  private def persist(s: Schedule): Unit = appendLine(
    s"""{"id":${quote(s.id)},"job_id":${quote(s.jobId)},"kind":${quote(s.kind)},"arg":${quote(s.arg)}}""")
  private def persistCancel(id: String): Unit =
    appendLine(s"""{"id":${quote(id)},"cancelled":true}""")
  private def persistPaused(id: String, paused: Boolean): Unit =
    appendLine(s"""{"id":${quote(id)},"paused":$paused}""")
  private def persistFired(id: String): Unit =
    appendLine(s"""{"id":${quote(id)},"fired":true}""")
  private def appendLine(json: String): Unit =
    log.foreach(p => Files.writeString(p, json + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND))

  private def arm(id: String, jobId: String, kind: String, arg: String,
                  f: ScheduledFuture[_], gen: Long = genSeq.incrementAndGet()): Schedule = {
    val s = Schedule(id, jobId, kind, arg, f, paused = false, gen = gen)
    schedules.put(id, s)
    s
  }

  private def armInterval(id: String, jobId: String, everyMs: Long): Schedule =
    arm(id, jobId, "interval", everyMs.toString,
      pool.scheduleAtFixedRate(() => fire(jobId), everyMs, everyMs,
        TimeUnit.MILLISECONDS))

  /** Arm a one-shot date trigger. The tick marks the entry FIRED under
    * the lock before submitting the job — a completed one-shot must
    * stay done: without the flag, pause() then resume() would re-arm it
    * and the job would fire a second time. Gen-guarded like cron: a
    * tick whose schedule was paused/replaced/cancelled does nothing. */
  private def armDate(id: String, jobId: String, delayMs: Long): Schedule = {
    val myGen = genSeq.incrementAndGet()
    val runnable: Runnable = () => {
      val current = stateLock.synchronized {
        val cur = schedules.get(id)
        val ok = cur != null && !cur.paused && cur.gen == myGen
        if (ok) {
          schedules.put(id, cur.copy(future = null, fired = true))
          // persisted too: a fired-then-paused one-shot must stay done
          // ACROSS restart — the replay otherwise re-creates the paused
          // entry with fired=false and resume() would refire it
          persistFired(id)
        }
        ok
      }
      if (current) fire(jobId)
    }
    arm(id, jobId, "date", delayMs.toString,
      pool.schedule(runnable, delayMs, TimeUnit.MILLISECONDS), myGen)
  }

  /** Arm the next cron fire. Each timer tick re-arms FIRST, then submits
    * the job to the workers — the next fire is never gated on this run.
    * The re-arm is guarded by stateLock and a currency check: a tick
    * whose schedule was paused, replaced or cancelled in the meantime
    * does nothing (neither re-arm nor fire). */
  private def armCron(id: String, jobId: String, cron: Cron, expr: String): Schedule = {
    val delay = cron.nextAfterMillis(System.currentTimeMillis())
    val myGen = genSeq.incrementAndGet()
    val runnable: Runnable = () => {
      val current = stateLock.synchronized {
        val cur = schedules.get(id)
        // generation check, not value equality: an update to the SAME
        // spec bumps gen, and this stale tick must die rather than arm
        // a second live timer chain. paused is checked separately —
        // pause() keeps the gen while disarming.
        val ok = cur != null && !cur.paused && cur.gen == myGen
        if (ok) armCron(id, jobId, cron, expr)
        ok
      }
      if (current) fire(jobId)
    }
    arm(id, jobId, "cron", expr,
      pool.schedule(runnable, delay, TimeUnit.MILLISECONDS), myGen)
  }

  private def nextId(): String = s"sched-${seq.incrementAndGet()}"

  /** Run `jobId` every `everyMs` (first fire after one interval). */
  def scheduleInterval(jobId: String, everyMs: Long): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    stateLock.synchronized {
      val s = armInterval(nextId(), jobId, everyMs)
      persist(s) // inside the lock: log order must match transition order
      s
    }
  }

  /** Run `jobId` once after `delayMs` (date trigger). */
  def scheduleOnce(jobId: String, delayMs: Long): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    stateLock.synchronized {
      val s = armDate(nextId(), jobId, delayMs)
      persist(s)
      s
    }
  }

  /** Run `jobId` on a 5-field cron expression (minute hour dom month dow),
    * e.g. "0-59/5 * * * *". Parsed eagerly so a bad expression fails here. */
  def scheduleCron(jobId: String, expr: String): Schedule = {
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    val cron = Cron.parse(expr)
    stateLock.synchronized {
      val s = armCron(nextId(), jobId, cron, expr)
      persist(s)
      s
    }
  }

  def list(): Seq[Schedule] = {
    import scala.jdk.CollectionConverters._
    schedules.values.asScala.toSeq.sortBy(_.id)
  }

  def get(id: String): Option[Schedule] = Option(schedules.get(id))

  /** Replace a schedule's trigger in place (PUT /schedules/{id},
    * schedules.py:86-101): same id, new kind/arg (and optionally a new
    * job). The new spec is validated/armed exactly like create; a paused
    * schedule stays paused with the new spec. */
  def update(id: String, jobId: String, kind: String, arg: String): Schedule = {
    // validate EVERYTHING before touching the live trigger: a rejected
    // PUT must leave the old schedule armed exactly as it was
    require(registry.getJob(jobId).isDefined, s"job $jobId not found")
    require(Set("interval", "cron", "date").contains(kind), s"unknown kind $kind")
    val parsedCron = if (kind == "cron") Some(Cron.parse(arg)) else { arg.toLong; None }
    stateLock.synchronized {
      val old = Option(schedules.get(id)).getOrElse(
        throw new NoSuchElementException(s"schedule $id not found"))
      if (old.future != null) { old.future.cancel(false); () }
      val s = if (old.paused) {
        val ns = Schedule(id, jobId, kind, arg, null, paused = true)
        schedules.put(id, ns); ns
      } else kind match {
        case "interval" => armInterval(id, jobId, arg.toLong)
        case "cron"     => armCron(id, jobId, parsedCron.get, arg)
        case _          => armDate(id, jobId, arg.toLong)
      }
      persist(s) // inside the lock: log order must match transition order
      s
    }
  }

  /** Disarm without forgetting (POST /schedules/{id}/pause,
    * schedules.py:104-111). Survives restart via a flag entry. */
  def pause(id: String): Boolean = stateLock.synchronized {
    Option(schedules.get(id)) match {
      case Some(s) if !s.paused =>
        if (s.future != null) { s.future.cancel(false); () }
        schedules.put(id, s.copy(future = null, paused = true))
        persistPaused(id, paused = true)
        true
      case Some(_) => true // already paused: idempotent
      case None    => false
    }
  }

  /** Re-arm a paused schedule (POST /schedules/{id}/resume). Interval and
    * cron re-arm from now; a paused date trigger re-arms with its original
    * delay (the reference's date schedules simply fire when resumed past
    * due — delay-from-resume is the closest restart-safe equivalent). */
  def resume(id: String): Boolean = stateLock.synchronized {
    Option(schedules.get(id)) match {
      case Some(s) if s.paused =>
        s.kind match {
          case "interval" => armInterval(id, s.jobId, s.arg.toLong)
          case "cron"     => armCron(id, s.jobId, Cron.parse(s.arg), s.arg)
          // an already-FIRED one-shot stays done: resume only clears
          // the pause flag, it must not buy the job a second fire
          case _ if s.fired => schedules.put(id, s.copy(paused = false)); ()
          case _          => armDate(id, s.jobId, s.arg.toLong)
        }
        persistPaused(id, paused = false)
        true
      case Some(_) => true // already running: idempotent
      case None    => false
    }
  }

  /** Fire immediately on the worker pool, independent of the trigger
    * (POST /schedules/{id}/run-now, schedules.py:128-137). Works on
    * paused schedules too, like the reference. */
  def runNow(id: String): Boolean = Option(schedules.get(id)) match {
    case Some(s) => fire(s.jobId); true
    case None    => false
  }

  def cancel(id: String): Boolean = stateLock.synchronized {
    Option(schedules.remove(id)) match {
      case Some(s) =>
        if (s.future != null) { s.future.cancel(false); () }
        persistCancel(id); true
      case None => false
    }
  }

  def shutdown(): Unit = { pool.shutdownNow(); workers.shutdownNow(); () }
}
