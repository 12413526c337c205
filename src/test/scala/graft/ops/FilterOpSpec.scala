package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FilterOpSpec extends SparkTestBase {
  import FilterOp._
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0), Some("Widget")),
    (2L, Some(30.0), Some("gadget")),
    (3L, None: Option[Double], Some("WIDGET pro")),
    (4L, Some(5.0), None: Option[String])
  ).toDF("id", "qty", "name")

  private def passIds(rule: Rule): Seq[Long] =
    FilterOp(df, rule)("pass").select(col("id")).collect().map(_.getLong(0)).toSeq.sorted

  private def failIds(rule: Rule): Seq[Long] =
    FilterOp(df, rule)("fail").select(col("id")).collect().map(_.getLong(0)).toSeq.sorted

  test("comparison operators") {
    assert(passIds(Leaf("qty", ">", 5)) === Seq(1L, 2L))
    assert(passIds(Leaf("qty", "<=", 10)) === Seq(1L, 4L))
    assert(passIds(Leaf("qty", "==", 30.0)) === Seq(2L))
    // pandas parity: NaN != v is True, so the null row PASSES a != leaf
    assert(passIds(Leaf("qty", "!=", 30.0)) === Seq(1L, 3L, 4L))
    assert(failIds(Leaf("qty", "!=", 30.0)) === Seq(2L))
    // pandas s != None is all-True
    assert(passIds(Leaf("qty", "!=", null)) === Seq(1L, 2L, 3L, 4L))
  }

  test("== with a list value means membership") {
    assert(passIds(Leaf("qty", "==", Seq(5.0, 10.0))) === Seq(1L, 4L))
  }

  test("contains is case-insensitive with null → false") {
    assert(passIds(Leaf("name", "contains", "widget")) === Seq(1L, 3L))
    assert(failIds(Leaf("name", "contains", "widget")) === Seq(2L, 4L))
  }

  test("NOT over a null leaf is TRUE (leaf-level falsiness, pandas parity)") {
    // reference: NaN comparison masks are False at the leaf; ~False = True
    assert(passIds(Node("NOT", Seq(Leaf("qty", ">", 5)))) === Seq(3L, 4L))
  }

  test("AND/OR compose two-valued leaves") {
    val r = Node("OR", Seq(
      Node("AND", Seq(Leaf("qty", ">", 5), Leaf("name", "contains", "widget"))),
      Leaf("qty", "<", 6)))
    assert(passIds(r) === Seq(1L, 4L))
  }

  test("pass and fail partition the input exactly") {
    val r = Node("NOT", Seq(Leaf("name", "contains", "a")))
    assert((passIds(r) ++ failIds(r)).sorted === Seq(1L, 2L, 3L, 4L))
  }

  test("NOT arity and unknown operators are rejected") {
    intercept[IllegalArgumentException] {
      compile(Node("NOT", Seq(Leaf("id", "==", 1), Leaf("id", "==", 2))))
    }
    intercept[IllegalArgumentException] { compile(Leaf("id", "~=", 1)) }
    intercept[IllegalArgumentException] { compile(Node("XOR", Seq(Leaf("id", "==", 1)))) }
  }

  test("compiled leaves reach the parquet scan as pushed filters (incl. !=)") {
    val dir = java.nio.file.Paths.get("target", "test-tmp", "filterop", "push").toString
    df.write.mode("overwrite").parquet(dir)
    def pushed(rule: Rule): String = {
      val plan = spark.read.parquet(dir).filter(compile(rule))
        .queryExecution.executedPlan.toString
      val at = plan.indexOf("PushedFilters: [")
      assert(at >= 0, s"no PushedFilters in plan:\n$plan")
      plan.substring(at, math.min(plan.length, at + 200))
    }
    // the conjunct form pushes fully
    val gt = pushed(Leaf("qty", ">", 5))
    assert(gt.contains("IsNotNull(qty)") && gt.contains("GreaterThan(qty,5"))
    // the != dual — IsNull OR Not(EqualTo) — pushes too (doc claim pinned)
    val ne = pushed(Leaf("qty", "!=", 30.0))
    assert(ne.contains("Or(IsNull(qty),Not(EqualTo(qty,30.0)))"),
      s"!= did not push: $ne")
  }

  test("predicate is two-valued: never null on null data") {
    val rules = Seq(
      Leaf("qty", ">", 5), Leaf("qty", "!=", 3), Leaf("name", "contains", "x"),
      Node("NOT", Seq(Leaf("qty", "<", 100))),
      Node("AND", Seq(Leaf("qty", ">", 0), Node("NOT", Seq(Leaf("name", "==", "z"))))))
    rules.foreach { r =>
      val nulls = df.select(predicate(r).as("p")).filter(col("p").isNull).count()
      assert(nulls === 0, s"rule $r produced NULL predicate values")
    }
  }
}
