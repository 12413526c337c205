package graft.runtime

import graft.runtime.Credentials._
import graft.util.JsonStr.quote
import java.nio.file.{Files, Path, StandardOpenOption}

/**
 * Process-wide registry of credentials + contexts, the engine-side seam the
 * config-driven DB components resolve through (reference: every database
 * component requires a context_id referencing a CredentialsMappingContext,
 * src/etl_core/components/databases/database.py:57-75,
 * context/credentials_mapping_context.py:152-217). Job configs carry ONLY
 * the context name (+ optional environment override) — hosts, users and
 * passwords live here, registered by the embedding application, the REST
 * surface, or the contexts CLI, so secrets never sit in job JSON.
 *
 * SECRET HANDLING under persistence (`bind(dir)` → contexts.jsonl,
 * tombstoned like the schedule log): the reference writes secrets to a
 * keyring and persists only non-secret parameters + secret KEYS
 * (docs/cli.md:96-99). The offline equivalent: a credentials entry may
 * carry `password` (kept in-process, never written to disk) or
 * `password_env` (an environment-variable NAME, persisted; the value
 * resolves at use). A restart therefore restores every entry except
 * plain in-process passwords — exactly the keyring trade-off.
 */
object Contexts {

  /** Registered credential material. `password` is process-local;
    * `passwordEnv` names an env var resolved at use time. */
  final case class CredSpec(id: String, user: String, host: String, port: Int,
                            database: String, password: Option[String],
                            passwordEnv: Option[String]) {
    def materialize(env: Map[String, String] = sys.env): Creds = {
      val pw = password.orElse(passwordEnv.map(e => env.getOrElse(e,
        throw new IllegalArgumentException(
          s"credentials $id: password env var '$e' is not set")))).getOrElse("")
      Creds(user, pw, host, port, database)
    }
  }

  /** CredentialsStore over CredSpecs, so MappingContext.resolve works
    * unchanged while specs stay persistable without their secrets. */
  final class SpecCredentialsStore extends CredentialsStore {
    private val specs = new java.util.concurrent.ConcurrentHashMap[String, CredSpec]()
    /** Direct registration of resolved creds (tests, embedding apps). */
    def put(id: String, c: Creds): Unit =
      specs.put(id, CredSpec(id, c.user, c.host, c.port, c.database,
        Some(c.password), None))
    def register(spec: CredSpec): Unit = specs.put(spec.id, spec)
    def specById(id: String): Option[CredSpec] = Option(specs.get(id))
    def byId(id: String): Option[Creds] = specById(id).map(_.materialize())
    def remove(id: String): Boolean = specs.remove(id) != null
    def ids(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      specs.keySet().asScala.toSeq.sorted
    }
    private[Contexts] def clear(): Unit = specs.clear()
  }

  val store = new SpecCredentialsStore

  /** A plain (non-credentials) context provider: named string parameters,
    * each secure or not (reference: context/context.py:13-67 `Context` with
    * `ContextParameter{key, value, is_secure}`; registered via
    * POST /contexts/context, api/routers/contexts.py:106-154). Secure
    * parameter VALUES live only in the process-local secret store below —
    * the persisted log keeps non-secure values plus secure KEYS, exactly
    * the reference's keyring split (ctx_handler.upsert of non_secure_params
    * + secure_param_keys). */
  final case class ContextSpec(id: String, name: String, environment: Environment,
                               nonSecure: Map[String, String],
                               secureKeys: Seq[String])

  private val plainContexts =
    new java.util.concurrent.ConcurrentHashMap[String, ContextSpec]()
  /** id → key → secure value; never persisted (keyring stand-in). */
  private val secretStore =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private val contexts =
    new java.util.concurrent.ConcurrentHashMap[String, MappingContext]()
  @volatile private var logPath: Option[Path] = None

  // ----------------------------------------------------------- registration

  def register(ctx: MappingContext): Unit = {
    // reference parity: a mapping referencing unknown credential ids is
    // rejected at create time (docs/cli.md:86-88)
    val missing = ctx.credentialsIds.values.filterNot(store.specById(_).isDefined)
    require(missing.isEmpty,
      s"context '${ctx.name}': unknown credential ids: ${missing.mkString(", ")}")
    contexts.put(ctx.name, ctx)
    append(ctxLine(ctx))
  }

  def registerCredentials(spec: CredSpec): Unit = {
    store.register(spec)
    append(credLine(spec))
  }

  /** Register a plain context: secure values go to the in-process secret
    * store ("bootstrap_to_store", contexts.py:125-127), metadata + secure
    * keys are persisted. Re-registration REPLACES the secret-store entry
    * unconditionally (an empty map clears it) so a previous
    * registration's secrets can never outlive their spec. */
  def registerPlainContext(spec: ContextSpec,
                           secureValues: Map[String, String]): Unit = {
    val undeclared = secureValues.keySet -- spec.secureKeys.toSet
    require(undeclared.isEmpty,
      s"context '${spec.name}': secure values for undeclared keys: ${undeclared.mkString(", ")}")
    // a key cannot be both persisted-in-plaintext and declared secure:
    // that would write the secret into contexts.jsonl and echo it on GET
    val overlap = spec.nonSecure.keySet.intersect(spec.secureKeys.toSet)
    require(overlap.isEmpty,
      s"context '${spec.name}': keys both secure and non-secure: ${overlap.mkString(", ")}")
    plainContexts.put(spec.id, spec)
    if (secureValues.nonEmpty) secretStore.put(spec.id, secureValues)
    else secretStore.remove(spec.id)
    append(plainCtxLine(spec))
  }

  def getPlainContext(id: String): Option[ContextSpec] =
    Option(plainContexts.get(id))

  /** Parameter lookup with the reference's resolution: non-secure from the
    * persisted spec, secure from the secret store (context.py:59-65
    * `get_parameter` KeyError parity — unknown keys are loud; a secure key
    * whose value did not survive a restart is also loud, not null). */
  def getParameter(ctxId: String, key: String): String = {
    val spec = getPlainContext(ctxId).getOrElse(throw new NoSuchElementException(
      s"context $ctxId not found"))
    spec.nonSecure.get(key).orElse(
      Option(secretStore.get(ctxId)).flatMap(_.get(key))).getOrElse {
      if (spec.secureKeys.contains(key))
        throw new IllegalStateException(
          s"context '${spec.name}': secure parameter '$key' is not available " +
            "in this process (secret values are not persisted; re-register)")
      else throw new NoSuchElementException(
        s"Parameter with key '$key' not found in context '${spec.name}'")
    }
  }

  def dropPlainContext(id: String): Boolean = {
    val removed = plainContexts.remove(id) != null
    if (removed) {
      secretStore.remove(id) // adapter.delete_from_store parity
      append(s"""{"kind":"tombstone","scope":"plain_context","id":${quote(id)}}""")
    }
    removed
  }

  def listPlainContexts(): Seq[ContextSpec] = {
    import scala.jdk.CollectionConverters._
    plainContexts.values.asScala.toSeq.sortBy(_.id)
  }

  def get(name: String): Option[MappingContext] = Option(contexts.get(name))
  def dropContext(name: String): Boolean = {
    val removed = contexts.remove(name) != null
    if (removed) append(s"""{"kind":"tombstone","scope":"context","id":${quote(name)}}""")
    removed
  }
  def dropCredentials(id: String): Boolean = {
    val removed = store.remove(id)
    if (removed) append(s"""{"kind":"tombstone","scope":"credentials","id":${quote(id)}}""")
    removed
  }
  def listContexts(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    contexts.keySet().asScala.toSeq.sorted
  }

  /** Execution-scoped environment override, the engine-side analogue of
    * the reference's `execute_job(job, environment=env)` parameter
    * (routers/execution.py:56-63): set for the duration of one job run and
    * consulted between a component's explicit `environment` param and the
    * EXECUTION_ENV process variable. THREAD-local, not process-global:
    * executions genuinely run concurrently here (the scheduler's worker
    * pool has 2+ threads and REST handlers run on their own pool), and a
    * process-global slot would make a concurrent run resolve the OTHER
    * run's credentials and leak an override past both runs' ends.
    * Credential resolution happens driver-side on the run's own thread
    * (JobRunner.run builds the graph synchronously), so thread scope is
    * exactly run scope. */
  private val executionEnv: ThreadLocal[Option[String]] =
    ThreadLocal.withInitial(() => None)

  def withExecutionEnv[A](env: Option[String])(f: => A): A = {
    val prev = executionEnv.get()
    executionEnv.set(env)
    try f finally executionEnv.set(prev)
  }

  /** Resolve active credentials for `contextName`: component override >
    * execution override > EXECUTION_ENV > context default
    * (database.py:57-95 + routers/execution.py:56-63 parity). */
  def resolve(contextName: String,
              overrideEnv: Option[String] = None): Creds = {
    val ctx = get(contextName).getOrElse(throw new IllegalArgumentException(
      s"unknown credentials context: $contextName"))
    val eff = overrideEnv.orElse(executionEnv.get())
    ctx.resolve(store, eff.map(Environment.fromName))._1
  }

  // ------------------------------------------------------------ persistence

  /** Attach (and replay) a contexts.jsonl under `dir`; subsequent
    * registrations write through. Plain passwords are NOT persisted. */
  def bind(dir: Path): Unit = synchronized {
    val p = dir.resolve("contexts.jsonl")
    logPath = None // replay without re-appending
    if (Files.exists(p)) replay(p)
    logPath = Some(p)
  }

  /** Detach persistence and clear all registrations (tests). */
  def reset(): Unit = synchronized {
    logPath = None
    contexts.clear()
    store.clear()
    plainContexts.clear()
    secretStore.clear()
  }

  private def append(line: String): Unit =
    logPath.foreach(p => Files.writeString(p, line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND))

  private def credLine(s: CredSpec): String =
    s"""{"kind":"credentials","id":${quote(s.id)},"user":${quote(s.user)},""" +
      s""""host":${quote(s.host)},"port":${s.port},"database":${quote(s.database)}""" +
      s.passwordEnv.map(e => s""","password_env":${quote(e)}""").getOrElse("") + "}"

  private def plainCtxLine(c: ContextSpec): String = {
    val ns = c.nonSecure.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}:${quote(v)}" }.mkString("{", ",", "}")
    val sk = c.secureKeys.sorted.map(quote).mkString("[", ",", "]")
    s"""{"kind":"plain_context","id":${quote(c.id)},"name":${quote(c.name)},""" +
      s""""environment":${quote(c.environment.name)},"non_secure":$ns,""" +
      s""""secure_keys":$sk}"""
  }

  private def ctxLine(c: MappingContext): String = {
    val ids = c.credentialsIds.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}:${quote(v)}" }.mkString("{", ",", "}")
    s"""{"kind":"context","name":${quote(c.name)},"credentials_ids":$ids,""" +
      s""""default_env":${quote(c.defaultEnv.name)}}"""
  }

  private def replay(p: Path): Unit = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    Files.readAllLines(p).forEach { line =>
      if (line.nonEmpty) {
        val j = org.json4s.jackson.JsonMethods.parse(line)
        (j \ "kind").extract[String] match {
          case "credentials" => store.register(CredSpec(
            (j \ "id").extract[String], (j \ "user").extract[String],
            (j \ "host").extract[String], (j \ "port").extract[Int],
            (j \ "database").extract[String], None,
            (j \ "password_env").extractOpt[String]))
          case "context" =>
            val ids = (j \ "credentials_ids") match {
              case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
              case _           => Map.empty[String, String]
            }
            contexts.put((j \ "name").extract[String], MappingContext(
              (j \ "name").extract[String], ids,
              Environment.fromName((j \ "default_env").extract[String])))
          case "plain_context" =>
            val ns = (j \ "non_secure") match {
              case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
              case _           => Map.empty[String, String]
            }
            val sk = (j \ "secure_keys") match {
              case JArray(xs) => xs.collect { case JString(s) => s }
              case _          => Nil
            }
            val id = (j \ "id").extract[String]
            // secure VALUES are not in the log by design — the spec reloads
            // with its secure keys marked present but unavailable
            plainContexts.put(id, ContextSpec(id, (j \ "name").extract[String],
              Environment.fromName((j \ "environment").extract[String]), ns, sk))
          case "tombstone" => (j \ "scope").extract[String] match {
            case "context"       => contexts.remove((j \ "id").extract[String])
            case "credentials"   => store.remove((j \ "id").extract[String])
            case "plain_context" => plainContexts.remove((j \ "id").extract[String])
          }
          case other => throw new IllegalArgumentException(
            s"contexts.jsonl: unknown kind '$other'")
        }
      }
    }
  }
}
