package graft.runtime

import graft.runtime.Credentials._

/**
 * Process-wide registry of credential contexts, the engine-side seam the
 * config-driven DB components resolve through (reference: every database
 * component requires a context_id referencing a CredentialsMappingContext,
 * src/etl_core/components/databases/database.py:57-75,
 * context/credentials_mapping_context.py:152-217). Job configs carry ONLY
 * the context name (+ optional environment override) — hosts, users and
 * passwords live here, registered by the embedding application or the
 * contexts CLI, so secrets never sit in job JSON.
 *
 * The store/registry pattern matches MongoIO.InMemoryStores: names resolve
 * in-process; a production deployment backs `store` with a secret manager.
 */
object Contexts {

  /** Global credential store (id → secret material). */
  val store = new InMemoryCredentialsStore

  private val contexts =
    new java.util.concurrent.ConcurrentHashMap[String, MappingContext]()

  def register(ctx: MappingContext): Unit = contexts.put(ctx.name, ctx)
  def get(name: String): Option[MappingContext] = Option(contexts.get(name))
  def drop(name: String): Unit = contexts.remove(name)
  def list(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    contexts.keySet().asScala.toSeq.sorted
  }

  /** Resolve active credentials for `contextName`: explicit override >
    * EXECUTION_ENV > context default (database.py:57-95 parity). */
  def resolve(contextName: String,
              overrideEnv: Option[String] = None): Creds = {
    val ctx = get(contextName).getOrElse(throw new IllegalArgumentException(
      s"unknown credentials context: $contextName"))
    ctx.resolve(store, overrideEnv.map(Environment.fromName))._1
  }
}
