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
    // the regex-gated exact path (tryConvert scaladoc): whitespace-padded
    // and signed integer strings still take the exact long parse, and a
    // >2^53 integer string survives without double-rounding (the double
    // path would silently yield ...992)
    assert(convStr(" 42 ", TInteger) === 42L)
    assert(convStr("-7", TInteger) === -7L)
    assert(convStr("+8", TInteger) === 8L)
    assert(convStr("9007199254740993", TInteger) === 9007199254740993L)
    // scientific notation only exists on the float-if-integral path
    assert(convStr("1e3", TInteger) === 1000L)
    // STAGED top-level path (apply) agrees with convert() on the same cases
    val staged = TypeConversionOp(
      Seq("42", "3.0", "3.5", "abc", " 42 ", "9007199254740993", null)
        .toDF("x"),
      Seq(CastRule("x", TInteger, NullPolicy)))
    assert(staged.schema("x").dataType === LongType)
    assert(staged.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq ===
      Seq(42L, 3L, null, null, 42L, 9007199254740993L, null))
    // temp staging columns do not leak into the output
    assert(staged.columns.toSeq === Seq("x"))
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

  test("deriveOutSchema: type swap + nullability from policy and source") {
    import graft.schema.FieldDef
    val in = Seq(
      FieldDef("a", TString),
      FieldDef("b", TString, nullable = true),
      FieldDef("n", TFloat),
      FieldDef("o", TObject, children = Seq(FieldDef("x", TString))),
      FieldDef("arr", TArray, item = Some(FieldDef("item", TString))))
    def derived(rules: CastRule*) =
      TypeConversionOp.deriveOutSchema(in, rules).map(f => f.name -> f).toMap
    // on_error=null: target swapped, nullable flipped
    val d1 = derived(CastRule("a", TInteger, NullPolicy))
    assert(d1("a").dataType === TInteger && d1("a").nullable)
    assert(d1("b") === in(1)) // untouched fields pass through
    // raise + STRING source still flips: nullish strings null-normalize
    val d2 = derived(CastRule("a", TInteger, RaisePolicy))
    assert(d2("a").nullable)
    // raise + non-string source: no new nulls, nullability kept
    val d3 = derived(CastRule("n", TInteger, RaisePolicy))
    assert(d3("n").dataType === TInteger && !d3("n").nullable)
    // string-family target never introduces nulls
    val d4 = derived(CastRule("n", TString, NullPolicy))
    assert(d4("n").dataType === TString && !d4("n").nullable)
    // nested + array wildcard paths rewrite the leaf
    val d5 = derived(CastRule("o.x", TInteger, NullPolicy),
      CastRule("arr.*", TFloat, NullPolicy))
    assert(d5("o").children.head.dataType === TInteger && d5("o").children.head.nullable)
    assert(d5("arr").item.get.dataType === TFloat)
    // a typo'd path fails like the conversion itself would
    intercept[IllegalArgumentException] {
      TypeConversionOp.deriveOutSchema(in, Seq(CastRule("ghost", TInteger, NullPolicy)))
    }
  }
}
