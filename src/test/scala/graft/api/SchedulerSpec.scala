package graft.api

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

class SchedulerSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val p = Paths.get("target", "test-tmp", "sched", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  private def smallJob(in: String, out: String) =
    s"""{ "name": "sjob", "components": [
       |  { "name": "r", "comp_type": "read_csv", "filepath": "$in",
       |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
       |    "out_port_schemas": { "out": { "fields": [
       |      { "name": "a", "data_type": "string" } ] } } },
       |  { "name": "w", "comp_type": "write_csv", "filepath": "$out",
       |    "in_port_schemas": { "in": { "fields": [
       |      { "name": "a", "data_type": "string" } ] } } } ] }""".stripMargin

  test("date trigger fires once; interval trigger fires repeatedly; cancel stops") {
    import spark.implicits._
    val reg = new ControlPlane.JobRegistry(spark)
    val in = tmp("in")
    graft.io.CsvIO.write(Seq("1").toDF("a"), in, singleFile = true)
    val job = reg.createJob(smallJob(in, tmp("out")))
    val sched = new Scheduler(reg)
    try {
      val once = sched.scheduleOnce(job.id, delayMs = 50)
      val deadline = System.currentTimeMillis() + 20000
      while (reg.listExecutions(jobId = Some(job.id)).isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val afterOnce = reg.listExecutions(jobId = Some(job.id))
      assert(afterOnce.nonEmpty)
      assert(afterOnce.head.status === "SUCCESS")
      assert(once.kind === "date")

      val interval = sched.scheduleInterval(job.id, everyMs = 300)
      val want = afterOnce.size + 2
      while (reg.listExecutions(jobId = Some(job.id)).size < want &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(reg.listExecutions(jobId = Some(job.id)).size >= want)

      assert(sched.cancel(interval.id))
      // cancel(false) lets an in-flight fire finish; after it drains the
      // count must stop growing
      Thread.sleep(1000)
      val frozen = reg.listExecutions(jobId = Some(job.id)).size
      Thread.sleep(800)
      assert(reg.listExecutions(jobId = Some(job.id)).size === frozen)
      assert(!sched.cancel("sched-ghost"))
    } finally sched.shutdown()
  }

  test("pause+resume of an already-fired one-shot must not fire it again") {
    import spark.implicits._
    val reg = new ControlPlane.JobRegistry(spark)
    val in = tmp("in_refire")
    graft.io.CsvIO.write(Seq("1").toDF("a"), in, singleFile = true)
    val job = reg.createJob(smallJob(in, tmp("out_refire")))
    val sched = new Scheduler(reg)
    try {
      val once = sched.scheduleOnce(job.id, delayMs = 30)
      val deadline = System.currentTimeMillis() + 20000
      while (reg.listExecutions(jobId = Some(job.id)).isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val fired = reg.listExecutions(jobId = Some(job.id)).size
      assert(fired >= 1)
      // the completed one-shot stays in the map; pause then resume used
      // to unconditionally re-schedule it — a one-shot firing twice
      assert(sched.pause(once.id))
      assert(sched.resume(once.id))
      Thread.sleep(800)
      assert(reg.listExecutions(jobId = Some(job.id)).size === fired,
        "resume of a fired one-shot re-armed it")
    } finally sched.shutdown()
  }

  test("fired one-shot stays done ACROSS restart: pause, restart, resume — no refire") {
    import spark.implicits._
    val store = Files.createDirectories(
      Paths.get("target", "test-tmp", "sched", s"fired-${System.nanoTime()}"))
    val reg = new ControlPlane.JobRegistry(spark, Some(store))
    val in = tmp("in_fired_restart")
    graft.io.CsvIO.write(Seq("1").toDF("a"), in, singleFile = true)
    val job = reg.createJob(smallJob(in, tmp("out_fired_restart")))
    val s1 = new Scheduler(reg, Some(store))
    val once = s1.scheduleOnce(job.id, delayMs = 30)
    val deadline = System.currentTimeMillis() + 20000
    while (reg.listExecutions(jobId = Some(job.id)).isEmpty &&
           System.currentTimeMillis() < deadline) Thread.sleep(100)
    val fired = reg.listExecutions(jobId = Some(job.id)).size
    assert(fired >= 1)
    assert(s1.pause(once.id))
    s1.shutdown()
    // restart: the fired flag is persisted, so the paused entry comes
    // back DONE and resume must not arm a second fire
    val s2 = new Scheduler(reg, Some(store))
    try {
      val re = s2.get(once.id).getOrElse(fail(s"schedule ${once.id} lost"))
      assert(re.paused && re.fired, "fired flag must survive restart")
      assert(s2.resume(once.id))
      Thread.sleep(800)
      assert(reg.listExecutions(jobId = Some(job.id)).size === fired,
        "resume after restart refired a completed one-shot")
    } finally s2.shutdown()
  }

  test("scheduling an unknown job is rejected") {
    val sched = new Scheduler(new ControlPlane.JobRegistry(spark))
    try intercept[IllegalArgumentException] { sched.scheduleOnce("ghost", 10) }
    finally sched.shutdown()
  }

  test("cron trigger arms to the next minute boundary; bad expressions fail fast") {
    import spark.implicits._
    val reg = new ControlPlane.JobRegistry(spark)
    val in = tmp("cron_in")
    graft.io.CsvIO.write(Seq("1").toDF("a"), in, singleFile = true)
    val job = reg.createJob(smallJob(in, tmp("cron_out")))
    val sched = new Scheduler(reg)
    try {
      val s = sched.scheduleCron(job.id, "* * * * *")
      assert(s.kind === "cron" && s.arg === "* * * * *")
      // armed strictly within the next minute (cron granularity)
      val delayMs = s.future.getDelay(java.util.concurrent.TimeUnit.MILLISECONDS)
      assert(delayMs > 0 && delayMs <= 60000)
      assert(sched.list().map(_.id).contains(s.id))
      assert(sched.cancel(s.id))
      intercept[IllegalArgumentException] { sched.scheduleCron(job.id, "bad expr") }
      intercept[IllegalArgumentException] { sched.scheduleCron("ghost", "* * * * *") }
    } finally sched.shutdown()
  }

  test("fires run on the worker pool: a slow job cannot starve another schedule") {
    import spark.implicits._
    val reg = new ControlPlane.JobRegistry(spark)
    val in = tmp("worker_in")
    graft.io.CsvIO.write(Seq("1").toDF("a"), in, singleFile = true)
    val fast = reg.createJob(smallJob(in, tmp("worker_out")))
    // a job that FAILS with a retry budget: each retry sleeps the constant
    // 1s backoff, so the execution occupies its worker for >= 3 s — two
    // orders more than the 300 ms fast-fire cadence needs (was 8 retries;
    // the starvation proof below depends only on fire START times, so the
    // extra 5 s bought nothing but suite wall)
    val slow = reg.createJob(
      s"""{ "name": "slowjob", "num_of_retries": 3, "components": [
         |  { "name": "r", "comp_type": "read_csv",
         |    "filepath": "${tmp("missing_nope")}",
         |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": { "fields": [
         |      { "name": "a", "data_type": "string" } ] } } },
         |  { "name": "w", "comp_type": "write_csv", "filepath": "${tmp("slow_out")}",
         |    "in_port_schemas": { "in": { "fields": [
         |      { "name": "a", "data_type": "string" } ] } } } ] }""".stripMargin)
    // 4 workers, not the default 2: with one worker held by the slow
    // job, fast fires must not SERIALIZE on the single remaining worker
    // — under load a ~2.6s fast Spark run would push the second start
    // past slowEnd and flake the proof. With spare workers, start times
    // depend only on the timer cadence, which is the property under test.
    val sched = new Scheduler(reg, workerThreads = 4)
    try {
      sched.scheduleOnce(slow.id, delayMs = 10)
      Thread.sleep(300) // slow fire is now deep in its retry loop
      sched.scheduleInterval(fast.id, everyMs = 300)
      // the slow execution completes, as FAILED, after its retry budget
      val slowDeadline = System.currentTimeMillis() + 30000
      while (reg.listExecutions(jobId = Some(slow.id)).isEmpty &&
             System.currentTimeMillis() < slowDeadline) Thread.sleep(100)
      val slowRec = reg.listExecutions(jobId = Some(slow.id)).head
      assert(slowRec.status === "FAILED")
      val slowEnd = slowRec.startedAtMs + slowRec.wallMs
      // post-hoc, race-free starvation proof: >= 2 fast executions
      // STARTED while the slow execution occupied its worker (execution
      // records land on completion, so poll for stragglers). With fires
      // on the timer thread every fast START would be blocked past
      // slowEnd; start times don't depend on how long the fast job RUNS,
      // which is what made the old live-poll form need 8 s of occupancy.
      def startedDuringSlow = reg.listExecutions(jobId = Some(fast.id))
        .count(_.startedAtMs < slowEnd)
      val fastDeadline = System.currentTimeMillis() + 20000
      while (startedDuringSlow < 2 &&
             System.currentTimeMillis() < fastDeadline) Thread.sleep(100)
      assert(startedDuringSlow >= 2,
        "no concurrent fast fires: schedule fires are starving behind the slow job")
    } finally sched.shutdown()
  }

  test("pause/resume/run-now/update; pause survives restart") {
    import spark.implicits._
    val store = Files.createDirectories(
      Paths.get("target", "test-tmp", "sched", s"pause-${System.nanoTime()}"))
    val reg = new ControlPlane.JobRegistry(spark, Some(store))
    val in = tmp("pause_in")
    graft.io.CsvIO.write(Seq("1").toDF("a"), in, singleFile = true)
    val job = reg.createJob(smallJob(in, tmp("pause_out")))

    val s1 = new Scheduler(reg, Some(store))
    val iv = s1.scheduleInterval(job.id, everyMs = 400)
    assert(s1.pause(iv.id)) // before the first fire at 400ms
    assert(s1.get(iv.id).exists(_.paused))
    assert(s1.pause(iv.id)) // idempotent
    Thread.sleep(900)
    assert(reg.listExecutions(jobId = Some(job.id)).isEmpty,
      "a paused interval must not fire")
    s1.shutdown()

    // restart: the schedule comes back paused and disarmed
    val s2 = new Scheduler(reg, Some(store))
    try {
      val re = s2.get(iv.id).getOrElse(fail(s"schedule ${iv.id} lost on restart"))
      assert(re.paused && re.future == null)
      Thread.sleep(600)
      assert(reg.listExecutions(jobId = Some(job.id)).isEmpty)

      // run-now fires even while paused
      assert(s2.runNow(iv.id))
      val deadline = System.currentTimeMillis() + 20000
      while (reg.listExecutions(jobId = Some(job.id)).isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val afterRunNow = reg.listExecutions(jobId = Some(job.id)).size
      assert(afterRunNow >= 1)

      // resume re-arms: the interval fires again on its own
      assert(s2.resume(iv.id))
      assert(s2.get(iv.id).exists(s => !s.paused && s.future != null))
      while (reg.listExecutions(jobId = Some(job.id)).size <= afterRunNow &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(reg.listExecutions(jobId = Some(job.id)).size > afterRunNow)

      // update replaces the trigger in place (same id, new arg)
      val up = s2.update(iv.id, job.id, "interval", "3600000")
      assert(up.id === iv.id && up.arg === "3600000" && !up.paused)
      intercept[NoSuchElementException] { s2.update("sched-ghost", job.id, "interval", "5") }
      intercept[IllegalArgumentException] { s2.update(iv.id, job.id, "warp", "5") }
      intercept[NumberFormatException] { s2.update(iv.id, job.id, "interval", "abc") }
      // a REJECTED update must leave the old trigger armed and unchanged
      val after = s2.get(iv.id).get
      assert(after.arg === "3600000" && after.future != null && !after.future.isCancelled)
    } finally s2.shutdown()

    // the updated spec (not the original) survives another restart
    val s3 = new Scheduler(reg, Some(store))
    try {
      val re = s3.get(iv.id).get
      assert(re.arg === "3600000" && !re.paused && re.future != null)
      assert(!s3.pause("sched-ghost") && !s3.resume("sched-ghost") && !s3.runNow("sched-ghost"))
    } finally s3.shutdown()
  }

  test("schedules persist and re-arm on restart; cancels are tombstoned") {
    import spark.implicits._
    val store = Files.createDirectories(
      Paths.get("target", "test-tmp", "sched", s"store-${System.nanoTime()}"))
    val reg = new ControlPlane.JobRegistry(spark, Some(store))
    val in = tmp("persist_in")
    graft.io.CsvIO.write(Seq("1").toDF("a"), in, singleFile = true)
    val job = reg.createJob(smallJob(in, tmp("persist_out")))

    val s1 = new Scheduler(reg, Some(store))
    val cron = s1.scheduleCron(job.id, "0 3 * * *")
    val ivl = s1.scheduleInterval(job.id, everyMs = 3600000)
    val cancelled = s1.scheduleInterval(job.id, everyMs = 3600000)
    assert(s1.cancel(cancelled.id))
    s1.shutdown()

    val s2 = new Scheduler(reg, Some(store))
    try {
      val byId = s2.list().map(s => s.id -> s).toMap
      assert(byId.keySet === Set(cron.id, ivl.id)) // tombstoned one is gone
      assert(byId(cron.id).kind === "cron" && byId(cron.id).arg === "0 3 * * *")
      assert(byId(ivl.id).kind === "interval")
      // re-armed futures are live
      assert(byId(cron.id).future.getDelay(java.util.concurrent.TimeUnit.MILLISECONDS) > 0)
    } finally s2.shutdown()
  }
}
