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

  /** Provider ids are ONE namespace across the three stores (plain
    * contexts, mapping contexts, credentials): a colliding id would be
    * shadowed on GET /{id} (which probes the stores in a fixed order)
    * and co-deleted on DELETE. Every create route enforces this, not
    * just /context. */
  private def requireFreshId(id: String): Unit =
    require(Contexts.getPlainContext(id).isEmpty && Contexts.get(id).isEmpty &&
      Contexts.store.specById(id).isEmpty,
      s"provider id '$id' already registered")

  /** POST /contexts/credentials body → registered spec. */
  def createCredentials(body: String): String = {
    val j = jackson.JsonMethods.parse(body)
    val id = (j \ "id").extractOpt[String].getOrElse(
      java.util.UUID.randomUUID().toString)
    requireFreshId(id)
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

  /** POST /contexts/context body → registered plain context provider
    * (reference: api/routers/contexts.py:106-154). Body:
    * `{name, environment, parameters}` where parameters is either a list
    * `[{key, value, is_secure}]` or a dict `{key: {value, is_secure}}`
    * (both accepted, context.py:36-57 `_normalize_params`). Secure values
    * go to the in-process secret store and are never echoed;
    * `parameters_registered` counts the SECURE keys (contexts.py:142). */
  def createContext(body: String): String = {
    val j = jackson.JsonMethods.parse(body)
    val id = (j \ "id").extractOpt[String].getOrElse(
      java.util.UUID.randomUUID().toString)
    val name = (j \ "name").extract[String]
    val env = Credentials.Environment.fromName(
      (j \ "environment").extractOpt[String].getOrElse("DEV"))
    def param(key: String, v: JValue): (String, String, Boolean) = (
      key,
      (v \ "value") match {
        case JString(s) => s
        case JNothing | JNull => throw new IllegalArgumentException(
          s"context parameter '$key': missing 'value'")
        case other => jackson.JsonMethods.compact(jackson.JsonMethods.render(other))
      },
      (v \ "is_secure").extractOpt[Boolean].getOrElse(false))
    val params: Seq[(String, String, Boolean)] = (j \ "parameters") match {
      case JArray(items) => items.map(p => param((p \ "key") match {
        case JString(k) => k
        case _ => throw new IllegalArgumentException("context parameter: missing 'key'")
      }, p))
      case JObject(fields) => fields.map { case (k, v) => param(k, v) }
      case JNothing => Nil
      case other => throw new IllegalArgumentException(
        s"context: 'parameters' must be a list or object, got $other")
    }
    val dup = params.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
    require(dup.isEmpty, s"context '$name': duplicate parameter keys: ${dup.mkString(", ")}")
    requireFreshId(id)
    val (secure, nonSecure) = params.partition(_._3)
    Contexts.registerPlainContext(
      Contexts.ContextSpec(id, name, env,
        nonSecure.map(p => p._1 -> p._2).toMap, secure.map(_._1)),
      secure.map(p => p._1 -> p._2).toMap)
    s"""{"id":${quote(id)},"kind":"context","environment":${quote(env.name)},""" +
      s""""parameters_registered":${secure.size}}"""
  }

  /** POST /contexts/mapping body → registered mapping context. Fails if
    * any referenced credential id is unknown (docs/cli.md:86-88). */
  def createMapping(body: String): String = {
    val j = jackson.JsonMethods.parse(body)
    val name = (j \ "name").extract[String]
    val ids = (j \ "credentials_ids") match {
      case JObject(fs) =>
        // reject non-string ids loudly: a silently-dropped entry would
        // report 201 with a short count and only fail at job runtime
        // ("No credentials configured for env ...") far from the typo
        val bad = fs.collect { case (k, v) if !v.isInstanceOf[JString] => k }
        require(bad.isEmpty, s"mapping: credentials_ids values must be " +
          s"strings — non-string for ${bad.mkString(", ")}")
        fs.collect { case (k, JString(v)) => k.toUpperCase -> v }.toMap
      case _ => throw new IllegalArgumentException("mapping: missing 'credentials_ids'")
    }
    val defaultEnv = Credentials.Environment.fromName(
      (j \ "default_env").extractOpt[String].getOrElse("DEV"))
    requireFreshId(name)
    Contexts.register(Credentials.MappingContext(name, ids, defaultEnv))
    s"""{"id":${quote(name)},"kind":"context","environment":${quote(defaultEnv.name)},""" +
      s""""credentials_registered":${ids.size}}"""
  }

  /** GET /contexts — combined provider list ({id, kind, name?,
    * environment?} rows, reference ProviderListItem contexts.py:78-83). */
  def listJson: String = {
    val creds = Contexts.store.ids().map(id =>
      s"""{"id":${quote(id)},"kind":"credentials"}""")
    val ctxs = Contexts.listContexts().map(n =>
      s"""{"id":${quote(n)},"kind":"context"}""")
    val plain = Contexts.listPlainContexts().map(c =>
      s"""{"id":${quote(c.id)},"kind":"context","name":${quote(c.name)},""" +
        s""""environment":${quote(c.environment.name)}}""")
    (ctxs ++ plain ++ creds).mkString("[", ",", "]")
  }

  /** GET /contexts/{id} — context or credentials, secrets withheld (a
    * plain context echoes non-secure values and only the KEYS of secure
    * ones, mirroring what the reference persists). */
  def getJson(id: String): Option[String] =
    Contexts.get(id).map { c =>
      val ids = c.credentialsIds.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${quote(k)}:${quote(v)}" }.mkString("{", ",", "}")
      s"""{"id":${quote(c.name)},"kind":"context","credentials_ids":$ids,""" +
        s""""default_env":${quote(c.defaultEnv.name)}}"""
    }.orElse(Contexts.getPlainContext(id).map { c =>
      val ns = c.nonSecure.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${quote(k)}:${quote(v)}" }.mkString("{", ",", "}")
      val sk = c.secureKeys.sorted.map(quote).mkString("[", ",", "]")
      s"""{"id":${quote(c.id)},"kind":"context","name":${quote(c.name)},""" +
        s""""environment":${quote(c.environment.name)},""" +
        s""""non_secure_params":$ns,"secure_param_keys":$sk,""" +
        s""""provider_class":"SecureContextAdapter"}"""
    }).orElse(Contexts.store.specById(id).map { s =>
      s"""{"id":${quote(s.id)},"kind":"credentials","user":${quote(s.user)},""" +
        s""""host":${quote(s.host)},"port":${s.port},"database":${quote(s.database)}""" +
        s.passwordEnv.map(e => s""","password_env":${quote(e)}""").getOrElse("") + "}"
    })

  /** DELETE /contexts/{id} — best-effort across all three stores
    * (contexts.py:316-330 deletes from secret store then both handlers). */
  def delete(id: String): Boolean =
    Contexts.dropContext(id) | Contexts.dropCredentials(id) |
      Contexts.dropPlainContext(id)
}
