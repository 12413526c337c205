package graft.api

import org.apache.spark.sql.SparkSession
import graft.config.JobConfig
import graft.graph.JobGraph
import graft.runtime.JobRunner
import graft.util.JsonStr.quote

/**
 * Control plane: job registry + execution records + REST surface,
 * mirroring the reference's API at parity level (reference:
 * src/etl_core/api/routers/jobs.py:88-263, execution.py:31-202,
 * persistence/configs/job_config.py:80-133):
 *
 *  - job create runs the DEEP validation pass — the config is parsed and
 *    the full wiring/port/schema contract is checked exactly as execution
 *    would (the reference constructs a throwaway RuntimeJob;
 *    JobGraph.validate IS that check here);
 *  - executions record status/attempts/wall time/error and are listable
 *    with filter, sort and paging like the reference execution router;
 *  - the HTTP layer is the JDK's built-in server (zero dependencies):
 *    POST/GET/DELETE /jobs, POST /execution/{jobId},
 *    GET /executions?job_id=&status=&limit=&offset=.
 *
 * The registry is an in-process store behind a small interface — a
 * persistent deployment swaps it for a database-backed one without
 * touching the engine.
 */
object ControlPlane {

  final case class JobRecord(id: String, name: String, configJson: String)
  final case class ExecutionRecord(
      id: String, jobId: String, startedAtMs: Long, wallMs: Long,
      status: String, attempts: Int, error: Option[String])

  final class JobRegistry(spark: SparkSession) {
    private val jobs = new java.util.concurrent.ConcurrentHashMap[String, JobRecord]()
    private val execs = new java.util.concurrent.ConcurrentHashMap[String, ExecutionRecord]()
    private val seq = new java.util.concurrent.atomic.AtomicLong(0)

    private def nextId(prefix: String): String = s"$prefix-${seq.incrementAndGet()}"

    /** Create = parse + DEEP wiring validation, then persist. */
    def createJob(configJson: String): JobRecord = {
      val spec = JobConfig.parse(configJson)
      JobGraph.validate(spec)
      val rec = JobRecord(nextId("job"), spec.name, configJson)
      jobs.put(rec.id, rec)
      rec
    }

    def getJob(id: String): Option[JobRecord] = Option(jobs.get(id))
    def listJobs(): Seq[JobRecord] = {
      import scala.jdk.CollectionConverters._
      jobs.values.asScala.toSeq.sortBy(_.id)
    }
    def deleteJob(id: String): Boolean = jobs.remove(id) != null

    /** Execute a persisted job through the retry runtime. */
    def execute(jobId: String): ExecutionRecord = {
      val job = getJob(jobId).getOrElse(
        throw new NoSuchElementException(s"job $jobId not found"))
      val started = System.currentTimeMillis()
      val res = JobRunner.run(spark, JobConfig.parse(job.configJson))
      val rec = ExecutionRecord(nextId("exec"), jobId, started, res.wallMs,
        if (res.succeeded) "SUCCESS" else "FAILED", res.attempts,
        res.lastError.map(e => (e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage)).take(300)))
      execs.put(rec.id, rec)
      rec
    }

    /** Execution listing with filter/sort/paging (execution.py:31-202). */
    def listExecutions(jobId: Option[String] = None, status: Option[String] = None,
                       sortDesc: Boolean = true, offset: Int = 0,
                       limit: Int = 50): Seq[ExecutionRecord] = {
      import scala.jdk.CollectionConverters._
      var xs = execs.values.asScala.toSeq
      jobId.foreach(j => xs = xs.filter(_.jobId == j))
      status.foreach(s => xs = xs.filter(_.status == s))
      val sorted = xs.sortBy(_.startedAtMs)
      (if (sortDesc) sorted.reverse else sorted).slice(offset, offset + limit)
    }
  }

  // ------------------------------------------------------------------ REST

  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private def jobJson(j: JobRecord): String =
    s"""{"id":${quote(j.id)},"name":${quote(j.name)}}"""
  private def execJson(e: ExecutionRecord): String =
    s"""{"id":${quote(e.id)},"job_id":${quote(e.jobId)},"status":${quote(e.status)},""" +
      s""""attempts":${e.attempts},"wall_ms":${e.wallMs}""" +
      e.error.map(er => s""","error":${quote(er)}""").getOrElse("") + "}"

  /** Start the REST server on `port` (0 = ephemeral); returns the server —
    * callers stop() it. */
  def serve(registry: JobRegistry, port: Int = 0): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)

    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    def handle(ex: HttpExchange)(f: => (Int, String)): Unit =
      try { val (c, b) = f; respond(ex, c, b) }
      catch {
        case e: NoSuchElementException => respond(ex, 404, s"""{"error":${quote(e.getMessage)}}""")
        case e: Exception => respond(ex, 400, s"""{"error":${quote(String.valueOf(e.getMessage))}}""")
      }
    def qparams(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _           => None
        }
      }.toMap).getOrElse(Map.empty)

    server.createContext("/jobs", (ex: HttpExchange) => handle(ex) {
      val path = ex.getRequestURI.getPath.stripPrefix("/jobs").stripPrefix("/")
      (ex.getRequestMethod, path) match {
        case ("POST", "") =>
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          (201, jobJson(registry.createJob(body)))
        case ("GET", "") =>
          (200, registry.listJobs().map(jobJson).mkString("[", ",", "]"))
        case ("GET", id) =>
          registry.getJob(id).map(j => (200, j.configJson))
            .getOrElse((404, s"""{"error":"job $id not found"}"""))
        case ("DELETE", id) =>
          if (registry.deleteJob(id)) (204, "") else (404, s"""{"error":"job $id not found"}""")
        case (m, _) => (405, s"""{"error":"method $m not allowed"}""")
      }
    })
    server.createContext("/execution", (ex: HttpExchange) => handle(ex) {
      val path = ex.getRequestURI.getPath.stripPrefix("/execution").stripPrefix("/")
      (ex.getRequestMethod, path) match {
        case ("POST", jobId) if jobId.nonEmpty =>
          (201, execJson(registry.execute(jobId)))
        case ("GET", "") =>
          val q = qparams(ex)
          val xs = registry.listExecutions(
            jobId = q.get("job_id"), status = q.get("status"),
            sortDesc = !q.get("sort").contains("asc"),
            offset = q.get("offset").map(_.toInt).getOrElse(0),
            limit = q.get("limit").map(_.toInt).getOrElse(50))
          (200, xs.map(execJson).mkString("[", ",", "]"))
        case (m, p) => (405, s"""{"error":"$m /execution/$p not supported"}""")
      }
    })
    server.start()
    server
  }
}
