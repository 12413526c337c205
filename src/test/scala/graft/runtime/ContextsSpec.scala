package graft.runtime

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Registry + persistence semantics for credentials contexts. Uses
  * reset() around each case: Contexts is process-global by design (the
  * connection seam config-driven components resolve through). */
class ContextsSpec extends AnyFunSuite {

  private def freshDir() = {
    val p = Paths.get("target", "test-tmp", "ctx", s"d${System.nanoTime()}")
    Files.createDirectories(p)
    p
  }

  test("mapping registration validates referenced credential ids") {
    Contexts.reset()
    intercept[IllegalArgumentException] {
      Contexts.register(Credentials.MappingContext(
        "m", Map("DEV" -> "nope"), Credentials.Dev))
    }
    Contexts.store.put("c1", Credentials.Creds("u", "p", database = "db"))
    Contexts.register(Credentials.MappingContext("m", Map("DEV" -> "c1"), Credentials.Dev))
    assert(Contexts.resolve("m").user === "u")
    Contexts.reset()
  }

  test("persistence: credentials survive restart via password_env; plain passwords do not") {
    val dir = freshDir()
    Contexts.reset()
    Contexts.bind(dir)
    Contexts.registerCredentials(Contexts.CredSpec(
      "envcred", "u1", "h", 9, "db1", None, Some("GRAFT_TEST_PW")))
    Contexts.registerCredentials(Contexts.CredSpec(
      "plaincred", "u2", "h", 9, "db2", Some("plain-secret"), None))
    Contexts.register(Credentials.MappingContext(
      "ctx", Map("TEST" -> "envcred"), Credentials.Test))
    Contexts.registerCredentials(Contexts.CredSpec(
      "doomed", "x", "", 0, "", None, None))
    assert(Contexts.dropCredentials("doomed"))

    // nothing secret on disk
    val log = Files.readString(dir.resolve("contexts.jsonl"))
    assert(!log.contains("plain-secret"))
    assert(log.contains("GRAFT_TEST_PW"))

    // "restart": clean registry, re-bind the same dir
    Contexts.reset()
    Contexts.bind(dir)
    assert(Contexts.store.ids() === Seq("envcred", "plaincred"))
    assert(Contexts.listContexts() === Seq("ctx"))
    // env-var password resolves at USE time
    val spec = Contexts.store.specById("envcred").get
    assert(spec.materialize(Map("GRAFT_TEST_PW" -> "s3cret")).password === "s3cret")
    intercept[IllegalArgumentException] { spec.materialize(Map.empty) }
    // the plain password did not survive (keyring trade-off): user data kept
    assert(Contexts.store.specById("plaincred").get.materialize(Map.empty).password === "")
    Contexts.reset()
  }

  test("execution env override sits between component override and context default") {
    Contexts.reset()
    Contexts.store.put("a", Credentials.Creds("devuser", "p"))
    Contexts.store.put("b", Credentials.Creds("testuser", "p"))
    Contexts.register(Credentials.MappingContext(
      "m", Map("DEV" -> "a", "TEST" -> "b"), Credentials.Dev))
    assert(Contexts.resolve("m").user === "devuser")
    Contexts.withExecutionEnv(Some("TEST")) {
      assert(Contexts.resolve("m").user === "testuser")
      // component-level override still wins over the execution override
      assert(Contexts.resolve("m", Some("DEV")).user === "devuser")
    }
    assert(Contexts.resolve("m").user === "devuser") // restored
    Contexts.reset()
  }

  test("execution env override is isolated between concurrent runs") {
    // the override is THREAD-scoped: a process-global slot made a
    // concurrent run with a different environment resolve the other
    // run's credentials (scheduler worker pool + REST genuinely run
    // executions concurrently) and leaked an override past both ends
    Contexts.reset()
    Contexts.store.put("a", Credentials.Creds("devuser", "p"))
    Contexts.store.put("b", Credentials.Creds("testuser", "p"))
    Contexts.register(Credentials.MappingContext(
      "m", Map("DEV" -> "a", "TEST" -> "b"), Credentials.Dev))
    val inside = new java.util.concurrent.CountDownLatch(2)
    val release = new java.util.concurrent.CountDownLatch(1)
    val users = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def runner(env: String): Thread = {
      val t = new Thread(() => Contexts.withExecutionEnv(Some(env)) {
        inside.countDown()
        release.await() // both threads hold their env AT THE SAME TIME
        users.put(env, Contexts.resolve("m").user)
      })
      t.start(); t
    }
    val ts = Seq(runner("DEV"), runner("TEST"))
    assert(inside.await(10, java.util.concurrent.TimeUnit.SECONDS))
    release.countDown()
    ts.foreach(_.join(10000))
    assert(users.get("DEV") === "devuser")
    assert(users.get("TEST") === "testuser")
    // nothing leaked past either run's end on this thread either
    assert(Contexts.resolve("m").user === "devuser")
    Contexts.reset()
  }

  test("plain context: secure values live only in-process; keys + non-secure persist") {
    val dir = freshDir()
    Contexts.reset()
    Contexts.bind(dir)
    Contexts.registerPlainContext(
      Contexts.ContextSpec("pc1", "api-ctx", Credentials.Test,
        nonSecure = Map("endpoint" -> "https://x.example", "region" -> "eu"),
        secureKeys = Seq("api_key")),
      secureValues = Map("api_key" -> "top-secret"))

    // resolution: non-secure from the spec, secure from the secret store
    assert(Contexts.getParameter("pc1", "endpoint") === "https://x.example")
    assert(Contexts.getParameter("pc1", "api_key") === "top-secret")
    // unknown key is loud (reference get_parameter KeyError parity)
    intercept[NoSuchElementException] { Contexts.getParameter("pc1", "nope") }
    // secure values for undeclared keys are rejected at registration
    intercept[IllegalArgumentException] {
      Contexts.registerPlainContext(
        Contexts.ContextSpec("pc2", "bad", Credentials.Dev, Map.empty, Nil),
        secureValues = Map("sneaky" -> "v"))
    }
    // a key declared both secure and non-secure would persist its secret
    // in plaintext — rejected
    intercept[IllegalArgumentException] {
      Contexts.registerPlainContext(
        Contexts.ContextSpec("pc3", "bad2", Credentials.Dev,
          Map("api_key" -> "leak"), Seq("api_key")),
        secureValues = Map("api_key" -> "leak"))
    }
    // re-registration without secure values CLEARS the secret store: the
    // old secret must not be resolvable under the new spec
    Contexts.registerPlainContext(
      Contexts.ContextSpec("pc1", "api-ctx", Credentials.Test,
        nonSecure = Map("endpoint" -> "https://x.example"), secureKeys = Nil),
      secureValues = Map.empty)
    intercept[NoSuchElementException] { Contexts.getParameter("pc1", "api_key") }
    // restore the original registration for the persistence checks below
    Contexts.registerPlainContext(
      Contexts.ContextSpec("pc1", "api-ctx", Credentials.Test,
        nonSecure = Map("endpoint" -> "https://x.example", "region" -> "eu"),
        secureKeys = Seq("api_key")),
      secureValues = Map("api_key" -> "top-secret"))

    // nothing secret on disk; keys and non-secure values are there
    val log = Files.readString(dir.resolve("contexts.jsonl"))
    assert(!log.contains("top-secret"))
    assert(log.contains("api_key") && log.contains("https://x.example"))

    // restart: spec reloads, secure VALUE did not survive and is loud
    Contexts.reset()
    Contexts.bind(dir)
    val spec = Contexts.getPlainContext("pc1").get
    assert(spec.name === "api-ctx" && spec.secureKeys === Seq("api_key"))
    assert(Contexts.getParameter("pc1", "region") === "eu")
    intercept[IllegalStateException] { Contexts.getParameter("pc1", "api_key") }

    // tombstone persists and purges
    assert(Contexts.dropPlainContext("pc1"))
    Contexts.reset()
    Contexts.bind(dir)
    assert(Contexts.getPlainContext("pc1").isEmpty)
    Contexts.reset()
  }

  test("delete tombstones persist") {
    val dir = freshDir()
    Contexts.reset()
    Contexts.bind(dir)
    Contexts.registerCredentials(Contexts.CredSpec("c", "u", "", 0, "", None, None))
    Contexts.register(Credentials.MappingContext("m", Map("DEV" -> "c"), Credentials.Dev))
    assert(Contexts.dropContext("m"))
    Contexts.reset()
    Contexts.bind(dir)
    assert(Contexts.listContexts().isEmpty)
    assert(Contexts.store.ids() === Seq("c"))
    Contexts.reset()
  }
}
