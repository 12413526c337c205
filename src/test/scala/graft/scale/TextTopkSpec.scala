package graft.scale

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins topTokens semantics (case-fold, blank filtering, deterministic
  * tiebreak) and its distributed top-k plan: TakeOrderedAndProject, not
  * a global Sort — each task forwards only its own k rows. */
class TextTopkSpec extends SparkTestBase {
  import spark.implicits._

  test("counts fold case, drop blanks, tiebreak (count desc, token asc)") {
    val df = Seq("the Cat sat", "THE cat", "  ", "dog the").toDF("text")
    val out = TextAnalysis.topTokens(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("the", 3L), ("cat", 2L), ("dog", 1L)))
    // ties at the k-th boundary resolve by token asc: dog before sat
    val out2 = TextAnalysis.topTokens(df, "text", 4)
      .collect().map(_.getString(0))
    assert(out2.toSeq === Seq("the", "cat", "dog", "sat"))
  }

  test("plan is a TakeOrderedAndProject, not a global sort") {
    val df = spark.range(2000).select(
      concat(lit("tok"), col("id") % 97, lit(" tok"), col("id") % 13).as("text"))
    val plan = TextAnalysis.topTokens(df, "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must compile to TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Sort ["),
      s"no global sort should survive:\n$plan")
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      TextAnalysis.topTokens(Seq("x").toDF("text"), "text", 0)
    }
  }

  test("top_tokens sample_fraction: narrows the census deterministically; bad fraction loud") {
    val in = java.nio.file.Paths.get("target", "test-tmp", "ttsf_in")
      .toAbsolutePath.toString
    (1 to 400).map(i => (i.toLong, s"common tok$i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    val docSchema =
      """{ "fields": [
        |  { "name": "doc_id", "data_type": "integer" },
        |  { "name": "text", "data_type": "string" } ] }""".stripMargin
    def job(extra: String): org.apache.spark.sql.DataFrame = {
      val out = java.nio.file.Paths.get("target", "test-tmp", "ttsf_out")
        .toAbsolutePath.toString
      val cfg =
        s"""{ "name": "ttsf", "components": [
           |  { "name": "r", "comp_type": "read_parquet", "filepath": "$in",
           |    "routes": { "out": [ { "to": "t", "in_port": "in" } ] },
           |    "out_port_schemas": { "out": $docSchema } },
           |  { "name": "t", "comp_type": "top_tokens", "k": 1$extra,
           |    "in_port_schemas": { "in": $docSchema },
           |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
           |    "out_port_schemas": { "out": { "fields": [
           |      { "name": "token", "data_type": "string" },
           |      { "name": "n_occurrences", "data_type": "integer" } ] } } },
           |  { "name": "w", "comp_type": "write_parquet", "filepath": "$out",
           |    "in_port_schemas": { "in": { "fields": [
           |      { "name": "token", "data_type": "string" },
           |      { "name": "n_occurrences", "data_type": "integer" } ] } } } ] }""".stripMargin
      val built = graft.graph.JobGraph.build(spark,
        graft.config.JobConfig.parse(cfg))
      built.runSinks(); built.close()
      spark.read.parquet(out)
    }
    val full = job("").as[(String, Long)].collect().toMap
    assert(full("common") === 400L)
    // the md5(seed:doc_id) half: same count as hashSample on the same ids
    val expected = graft.ops.RelationalOps.hashSample(
      spark.read.parquet(in), "doc_id", 0.5, "s18").count()
    val sampled = job(""", "sample_fraction": 0.5, "sample_seed": "s18",
      "sample_id_column": "doc_id"""").as[(String, Long)].collect().toMap
    assert(sampled("common") === expected,
      "sampled census must count exactly the hashSample survivors")
    assert(expected > 100 && expected < 300, "a real cut, not a no-op")
    val e = intercept[IllegalArgumentException](job(""", "sample_fraction": 1.5"""))
    assert(e.getMessage.contains("sample_fraction"))
    intercept[IllegalArgumentException](job(""", "sample_fraction": 0.0"""))
  }
}
