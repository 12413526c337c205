package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for COVERAGE.md: the manifest maps the reference's 42
  * combination-job shapes to CORRECTNESS queries and indexes every query,
  * and this spec pins it to the code in BOTH directions so it cannot
  * silently rot as queries are added, renamed, or removed. No Spark
  * session needed — `SparkEntry.queries` is a map of thunks. */
class CoverageManifestSpec extends AnyFunSuite {

  private val manifest = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("every CORRECTNESS query is cited in COVERAGE.md") {
    val missing = SparkEntry.queries.keySet.filterNot(manifest.contains)
    assert(missing.isEmpty,
      s"queries missing from COVERAGE.md (add them to the query index): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("every q_* name cited in COVERAGE.md is a live query") {
    // \b works because '_' is a word char: q_job_sim never matches inside
    // q_job_sim_knn. Catches renamed/removed queries still cited anywhere
    // in the manifest (tables, prose, or the index). A trailing underscore
    // (`q_job_*` glob prose) is a family prefix, not a query name.
    val cited = "\\bq_[a-z0-9_]*[a-z0-9]\\b".r.findAllIn(manifest).toSet
    val stale = cited -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"COVERAGE.md cites queries that do not exist: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every beyond-reference query family is cited in COVERAGE.md") {
    val families = "\\b(dedup|sim|text)_[a-z0-9_]+\\b".r.findAllIn(manifest).toSet
    // a cited name that is a registered comp_type (e.g. text_normalize,
    // text_analysis) is a component citation, not a query citation
    val stale = families -- SparkEntry.queries.keySet --
      graft.api.ComponentSchemas.compTypes.toSet
    assert(stale.isEmpty,
      s"COVERAGE.md cites unknown non-q queries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every oracleSql key is a queries key and the gate is fully oracled") {
    // the driver records a weaker rows-only check for queries without
    // oracle SQL; this project keeps the gate at 100% oracle coverage
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracleSql entries without a query: ${orphanOracles.toSeq.sorted.mkString(", ")}")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"queries without oracle SQL (driver downgrades to rows-only): " +
        unoracled.toSeq.sorted.mkString(", "))
  }
}
