package graft.api

import graft.runtime.{Contexts, Credentials}
import graft.util.JsonStr.quote
import org.json4s._

/**
 * JSON surface for contexts & credentials, shared by the REST routes and
 * the CLI (reference: src/etl_core/api/routers/contexts.py — 9 handlers —
 * and api/cli/commands/contexts.py; docs/cli.md:75-99). Secrets policy
 * mirrors Contexts: a plain `password` is accepted but never echoed back
 * or persisted; `password_env` names the env var that carries it.
 */
object ContextsApi {
  private implicit val fmts: Formats = DefaultFormats

  /** POST /contexts/credentials body → registered spec. */
  def createCredentials(body: String): String = {
    val j = jackson.JsonMethods.parse(body)
    val id = (j \ "id").extractOpt[String].getOrElse(
      java.util.UUID.randomUUID().toString)
    val spec = Contexts.CredSpec(
      id,
      (j \ "user").extractOpt[String].getOrElse(""),
      (j \ "host").extractOpt[String].getOrElse(""),
      (j \ "port").extractOpt[Int].getOrElse(0),
      (j \ "database").extractOpt[String].getOrElse(""),
      (j \ "password").extractOpt[String],
      (j \ "password_env").extractOpt[String])
    Contexts.registerCredentials(spec)
    val n = Seq(spec.user, spec.host, spec.database).count(_.nonEmpty) +
      (if (spec.port != 0) 1 else 0) +
      (if (spec.password.isDefined || spec.passwordEnv.isDefined) 1 else 0)
    s"""{"id":${quote(id)},"kind":"credentials","parameters_registered":$n}"""
  }

  /** POST /contexts/mapping body → registered mapping context. Fails if
    * any referenced credential id is unknown (docs/cli.md:86-88). */
  def createMapping(body: String): String = {
    val j = jackson.JsonMethods.parse(body)
    val name = (j \ "name").extract[String]
    val ids = (j \ "credentials_ids") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k.toUpperCase -> v }.toMap
      case _ => throw new IllegalArgumentException("mapping: missing 'credentials_ids'")
    }
    val defaultEnv = Credentials.Environment.fromName(
      (j \ "default_env").extractOpt[String].getOrElse("DEV"))
    Contexts.register(Credentials.MappingContext(name, ids, defaultEnv))
    s"""{"id":${quote(name)},"kind":"context","environment":${quote(defaultEnv.name)},""" +
      s""""credentials_registered":${ids.size}}"""
  }

  /** GET /contexts — combined provider list ({id, kind} rows). */
  def listJson: String = {
    val creds = Contexts.store.ids().map(id =>
      s"""{"id":${quote(id)},"kind":"credentials"}""")
    val ctxs = Contexts.listContexts().map(n =>
      s"""{"id":${quote(n)},"kind":"context"}""")
    (ctxs ++ creds).mkString("[", ",", "]")
  }

  /** GET /contexts/{id} — context or credentials, secrets withheld. */
  def getJson(id: String): Option[String] =
    Contexts.get(id).map { c =>
      val ids = c.credentialsIds.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${quote(k)}:${quote(v)}" }.mkString("{", ",", "}")
      s"""{"id":${quote(c.name)},"kind":"context","credentials_ids":$ids,""" +
        s""""default_env":${quote(c.defaultEnv.name)}}"""
    }.orElse(Contexts.store.specById(id).map { s =>
      s"""{"id":${quote(s.id)},"kind":"credentials","user":${quote(s.user)},""" +
        s""""host":${quote(s.host)},"port":${s.port},"database":${quote(s.database)}""" +
        s.passwordEnv.map(e => s""","password_env":${quote(e)}""").getOrElse("") + "}"
    })

  /** DELETE /contexts/{id} — best-effort across both stores. */
  def delete(id: String): Boolean =
    Contexts.dropContext(id) | Contexts.dropCredentials(id)
}
