package graft.runtime

/**
 * Environment-scoped credential resolution, mirroring the reference's
 * context surface (reference: src/etl_core/context/environment.py,
 * credentials.py, credentials_mapping_context.py:10-60,209-217):
 *
 *  - environments DEV | TEST | PROD;
 *  - a CredentialsMappingContext maps environment → credentials id;
 *  - the active environment resolves explicit override > EXECUTION_ENV
 *    process variable > context default;
 *  - credential SECRETS never live in job configs — they resolve from a
 *    store at execution time (here: an in-process registry seeded from
 *    environment variables or tests; a production impl backs it with a
 *    secret manager).
 */
object Credentials {

  sealed trait Environment { def name: String }
  case object Dev  extends Environment { val name = "DEV" }
  case object Test extends Environment { val name = "TEST" }
  case object Prod extends Environment { val name = "PROD" }

  object Environment {
    def fromName(s: String): Environment = s.trim.toUpperCase match {
      case "DEV"  => Dev
      case "TEST" => Test
      case "PROD" => Prod
      case other  => throw new IllegalArgumentException(s"unknown environment: $other")
    }
  }

  final case class Creds(user: String, password: String,
                         host: String = "", port: Int = 0, database: String = "")

  /** Credential store seam; in-process registry for offline use. */
  trait CredentialsStore { def byId(id: String): Option[Creds] }

  final class InMemoryCredentialsStore extends CredentialsStore {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, Creds]()
    def put(id: String, c: Creds): Unit = m.put(id, c)
    def byId(id: String): Option[Creds] = Option(m.get(id))
  }

  /**
   * env → credentials-id mapping with the reference's resolution order:
   * explicit override > EXECUTION_ENV > context default
   * (credentials_mapping_context.py:209-217).
   */
  final case class MappingContext(
      name: String,
      credentialsIds: Map[String, String],
      defaultEnv: Environment,
      env: Map[String, String] = sys.env) {

    def activeEnvironment(overrideEnv: Option[Environment] = None): Environment =
      overrideEnv
        .orElse(env.get("EXECUTION_ENV").map(Environment.fromName))
        .getOrElse(defaultEnv)

    def resolve(store: CredentialsStore,
                overrideEnv: Option[Environment] = None): (Creds, String) = {
      val e = activeEnvironment(overrideEnv)
      val id = credentialsIds.getOrElse(e.name,
        throw new IllegalArgumentException(
          s"No credentials configured for env '${e.name}' in context '$name'"))
      val creds = store.byId(id).getOrElse(
        throw new IllegalArgumentException(s"Credentials with ID $id not found"))
      (creds, id)
    }
  }
}
