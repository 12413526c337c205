package graft.ops

import graft.SparkTestBase
import graft.schema.GraftType._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the reference's scalar conversion table (SURVEY §2.1.3,
  * type_conversion_helper.py:80-146) case by case. */
class TypeConversionSpec extends SparkTestBase {
  import TypeConversionOp._
  import spark.implicits._

  private def convStr(v: String, target: graft.schema.GraftType,
                      policy: OnError = NullPolicy): Any = {
    val df = Seq(Option(v)).toDF("x")
      .select(convert(col("x"), StringType, target, policy).as("y"))
    val r = df.head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("null-ish strings normalize to NULL before cast") {
    for (s <- Seq("", "na", "NaN", " null ", "None", "  NA  "))
      assert(convStr(s, TInteger) === null, s"'$s'")
  }

  test("string → integer: int parse, float-if-integral, else null") {
    assert(convStr("42", TInteger) === 42L)
    assert(convStr("3.0", TInteger) === 3L)
    assert(convStr("3.5", TInteger) === null)
    assert(convStr("abc", TInteger) === null)
  }

  test("string → float accepts numerics") {
    assert(convStr("2.5", TFloat) === 2.5)
    assert(convStr("7", TFloat) === 7.0)
    assert(convStr("x", TFloat) === null)
  }

  test("string → boolean domain: true/t/1/yes/y and false/f/0/no/n") {
    for (s <- Seq("true", "T", " 1 ", "YES", "y")) assert(convStr(s, TBoolean) === true, s)
    for (s <- Seq("false", "F", "0", "No", " n ")) assert(convStr(s, TBoolean) === false, s)
    assert(convStr("maybe", TBoolean) === null)
  }

  test("boolean source rejected for numeric targets") {
    val df = Seq(true).toDF("x")
    assert(df.select(convert(col("x"), BooleanType, TInteger, NullPolicy)).head().isNullAt(0))
    assert(df.select(convert(col("x"), BooleanType, TFloat, NullPolicy)).head().isNullAt(0))
  }

  test("numeric → integer: floats accepted iff integral") {
    val df = Seq(3.0, 3.5).toDF("x")
      .select(convert(col("x"), DoubleType, TInteger, NullPolicy).as("y"))
      .orderBy(col("y").asc_nulls_last).collect()
    assert(df(0).getLong(0) === 3L)
    assert(df(1).isNullAt(0))
  }

  test("numeric → boolean: only 0/1") {
    val rows = Seq(0L, 1L, 2L).toDF("x")
      .select(col("x"), convert(col("x"), LongType, TBoolean, NullPolicy).as("y"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(rows(0L) === false)
    assert(rows(1L) === true)
    assert(rows(2L) === null)
  }

  test("→ string keeps null and stringifies values") {
    assert(convStr("hi", TString) === "hi")
    val df = Seq(12L).toDF("x").select(convert(col("x"), LongType, TString, NullPolicy))
    assert(df.head().getString(0) === "12")
  }

  test("raise policy fails the job on unconvertible values") {
    val e = intercept[Exception] {
      Seq("boom").toDF("x")
        .select(convert(col("x"), StringType, TInteger, RaisePolicy)).collect()
    }
    assert(e.getMessage.contains("boom"))
    // but convertible + null values pass
    val ok = Seq(Some("5"), None).toDF("x")
      .select(convert(col("x"), StringType, TInteger, RaisePolicy)).collect()
    assert(ok(0).getLong(0) === 5L)
    assert(ok(1).isNullAt(0))
  }

  test("skip policy: string target keeps original, numeric degrades to null") {
    // STRING target: unconvertible value survives untouched (lossless)
    assert(convStr("anything", TString, SkipPolicy) === "anything")
    // numeric target: mixed dtype is impossible in Spark → documented null
    assert(convStr("xyz", TInteger, SkipPolicy) === null)
  }

  test("nested struct path conversion") {
    val df = spark.range(1).select(struct(lit("7").as("n"), lit("keep").as("s")).as("o"))
    val out = TypeConversionOp(df, Seq(CastRule("o.n", TInteger, NullPolicy)))
    assert(out.schema("o").dataType.asInstanceOf[StructType]("n").dataType === LongType)
    assert(out.select(col("o.n")).head().getLong(0) === 7L)
    assert(out.select(col("o.s")).head().getString(0) === "keep")
  }

  test("array wildcard path: arr.* converts every element") {
    val df = spark.range(1).select(array(lit("1"), lit("2"), lit("x")).as("arr"))
    val out = TypeConversionOp(df, Seq(CastRule("arr.*", TInteger, NullPolicy)))
    assert(out.head().getSeq[Any](0) === Seq(1L, 2L, null))
  }
}
