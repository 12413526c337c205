package graft.runtime

import org.scalatest.funsuite.AnyFunSuite

class CredentialsSpec extends AnyFunSuite {
  import Credentials._

  private val store = new InMemoryCredentialsStore
  store.put("cred-dev", Creds("dev_user", "dev_pw"))
  store.put("cred-prod", Creds("prod_user", "prod_pw", "db.example", 5432, "warehouse"))

  private def ctx(env: Map[String, String] = Map.empty) = MappingContext(
    "db-ctx", Map("DEV" -> "cred-dev", "PROD" -> "cred-prod"), Dev, env)

  test("resolution order: explicit > EXECUTION_ENV > context default") {
    assert(ctx().activeEnvironment() === Dev)
    assert(ctx(Map("EXECUTION_ENV" -> "prod")).activeEnvironment() === Prod)
    assert(ctx(Map("EXECUTION_ENV" -> "prod")).activeEnvironment(Some(Test)) === Test)
  }

  test("resolve returns the environment's credentials") {
    val (c, id) = ctx().resolve(store)
    assert((c.user, id) === (("dev_user", "cred-dev")))
    val (p, _) = ctx().resolve(store, Some(Prod))
    assert(p.database === "warehouse")
  }

  test("missing mapping and missing credentials fail with the reference messages") {
    val e1 = intercept[IllegalArgumentException] { ctx().resolve(store, Some(Test)) }
    assert(e1.getMessage.contains("No credentials configured for env 'TEST'"))
    val broken = MappingContext("x", Map("DEV" -> "ghost"), Dev)
    val e2 = intercept[IllegalArgumentException] { broken.resolve(store) }
    assert(e2.getMessage.contains("Credentials with ID ghost not found"))
  }

  test("unknown environment name rejected") {
    intercept[IllegalArgumentException] { Environment.fromName("STAGING") }
  }
}
