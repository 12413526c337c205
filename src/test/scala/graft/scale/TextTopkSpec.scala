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
}
