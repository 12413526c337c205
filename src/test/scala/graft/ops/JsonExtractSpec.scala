package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RelationalOps.jsonExtract: typed extraction semantics (missing path,
  * malformed JSON, uncastable value → NULL), path normalization,
  * keep_source, guards, and the narrow-map plan. */
class JsonExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, """{"k": 7, "s": "x", "b": true, "f": 1.5}"""),
    (2L, """{"k": "notanint", "s": null}"""),
    (3L, "not json at all"),
    (4L, null.asInstanceOf[String])
  ).toDF("id", "js")

  test("typed extraction with lenient nulls") {
    val out = RelationalOps.jsonExtract(df, "js", Seq(
      ("k", "k", "integer"),        // bare path normalizes to $.k
      ("$.s", "s", "string"),
      ("$.b", "b", "boolean"),
      ("$.f", "f", "float"),
      ("$.missing", "m", "string")))
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) null else r.getLong(2),
        r.getString(3),
        if (r.isNullAt(4)) null else r.getBoolean(4),
        if (r.isNullAt(5)) null else r.getDouble(5),
        r.getString(6)))
    assert(out.toSeq === Seq(
      (1L, 7L, "x", true, 1.5, null),
      (2L, null, null, null, null, null), // uncastable k, JSON-null s
      (3L, null, null, null, null, null), // malformed JSON
      (4L, null, null, null, null, null))) // null blob
  }

  test("keep_source=false drops the blob; guards are loud") {
    val out = RelationalOps.jsonExtract(df, "js",
      Seq(("k", "k", "integer")), keepSource = false)
    assert(out.columns.toSeq === Seq("id", "k"))
    intercept[IllegalArgumentException] {
      RelationalOps.jsonExtract(df, "js", Nil)
    }
    intercept[IllegalArgumentException] {
      RelationalOps.jsonExtract(df, "nope", Seq(("k", "k", "string")))
    }
    intercept[IllegalArgumentException] { // dest collides with input
      RelationalOps.jsonExtract(df, "js", Seq(("k", "id", "integer")))
    }
    intercept[IllegalArgumentException] { // duplicate dests
      RelationalOps.jsonExtract(df, "js",
        Seq(("k", "k", "integer"), ("s", "k", "string")))
    }
    intercept[IllegalArgumentException] { // unknown type
      RelationalOps.jsonExtract(df, "js", Seq(("k", "k", "decimal")))
    }
  }

  test("plan: extraction is a narrow map — no exchange, inside codegen") {
    // a file-backed scan: a local relation constant-folds into
    // LocalTableScan and hides the codegen span this test pins
    val dir = java.nio.file.Files.createTempDirectory("graft_jx")
      .resolve("in").toString
    df.write.mode("overwrite").parquet(dir)
    val plan = RelationalOps.jsonExtract(spark.read.parquet(dir), "js",
      Seq(("k", "k", "integer"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"json_extract must not shuffle:\n$plan")
    // "*(n)" is toString's WholeStageCodegen span marker
    assert(plan.contains("*(1) Project") && plan.contains("try_cast"), plan)
  }
}
