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

  test("scheduling an unknown job is rejected") {
    val sched = new Scheduler(new ControlPlane.JobRegistry(spark))
    try intercept[IllegalArgumentException] { sched.scheduleOnce("ghost", 10) }
    finally sched.shutdown()
  }
}
