package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class SchemaMappingAggSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------- schema mapping

  test("map mode renames and rebuilds nested destination paths") {
    import SchemaMappingOp.MapRule
    val in = Seq((1L, "x", 10L)).toDF("id", "seg", "nk")
    val out = SchemaMappingOp.mapMode(
      Map("in" -> in),
      Map("out" -> Seq(
        MapRule("in", "id", "cust_id"),
        MapRule("in", "nk", "geo.nation_key"),
        MapRule("in", "seg", "geo.deep.segment"))))("out")
    assert(out.columns.toSeq === Seq("cust_id", "geo"))
    val geo = out.head().getAs[Row]("geo")
    assert(geo.getAs[Long]("nation_key") === 10L)
    assert(geo.getAs[Row]("deep").getAs[String]("segment") === "x")
  }

  test("map mode rejects destination path conflicts and mixed src ports") {
    import SchemaMappingOp.MapRule
    val in = Seq((1L, "x")).toDF("a", "b")
    intercept[IllegalArgumentException] {
      SchemaMappingOp.mapMode(Map("in" -> in), Map("out" -> Seq(
        MapRule("in", "a", "p"),
        MapRule("in", "b", "p.q")))) // p is a leaf AND an object
    }
    intercept[IllegalArgumentException] {
      SchemaMappingOp.mapMode(Map("in" -> in, "in2" -> in), Map("out" -> Seq(
        MapRule("in", "a", "x"),
        MapRule("in2", "b", "y"))))
    }
  }

  test("join mode: chained steps with intermediate ports") {
    import SchemaMappingOp.JoinStep
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val b = Seq((1L, "b1"), (3L, "b3")).toDF("k2", "bv")
    val c = Seq(("a1", "c!")).toDF("av2", "cv")
    val out = SchemaMappingOp.joinMode(
      Map("A" -> a, "B" -> b, "C" -> c),
      Seq(
        JoinStep("A", "B", Seq("k"), Seq("k2"), "left", "AB"),
        JoinStep("AB", "C", Seq("av"), Seq("av2"), "inner", "out")))("out")
    val row = out.select(col("k"), col("bv"), col("cv")).head()
    assert((row.getLong(0), row.getString(1), row.getString(2)) === ((1L, "b1", "c!")))
  }

  test("join mode: outer join keeps both dangling sides") {
    import SchemaMappingOp.JoinStep
    val a = Seq((1L, "a")).toDF("k", "av")
    val b = Seq((2L, "b")).toDF("k", "bv")
    val out = SchemaMappingOp.joinMode(Map("A" -> a, "B" -> b),
      Seq(JoinStep("A", "B", Seq("k"), Seq("k"), "outer", "out")))("out")
    assert(out.count() === 2)
    intercept[IllegalArgumentException] {
      SchemaMappingOp.joinMode(Map("A" -> a, "B" -> b),
        Seq(JoinStep("A", "B", Seq("k"), Seq("k"), "cross", "out")))
    }
  }

  // ---------------------------------------------------------- aggregation

  private lazy val sales = Seq(
    ("a", Some(1.0)), ("a", Some(3.0)), ("a", None), ("b", Some(5.0))
  ).toDF("g", "v")

  test("count(*) counts rows, count(col) counts non-null") {
    import AggregateOp.AggSpec
    val out = AggregateOp(sales, Seq("g"), Seq(
      AggSpec("*", "count", "n_rows"), AggSpec("v", "count", "n_vals")))
      .orderBy(col("g")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("a", 3L, 2L), ("b", 1L, 1L)))
  }

  test("mean/median/std/nunique match pandas semantics (ddof=1)") {
    import AggregateOp.AggSpec
    val df = Seq(1.0, 2.0, 3.0, 3.0).toDF("v")
    val r = AggregateOp(df, Nil, Seq(
      AggSpec("v", "mean", "m"), AggSpec("v", "median", "md"),
      AggSpec("v", "std", "sd"), AggSpec("v", "nunique", "nu"))).head()
    assert(r.getDouble(0) === 2.25)
    assert(r.getDouble(1) === 2.5)
    assert(math.abs(r.getDouble(2) - 0.9574271077563381) < 1e-12) // sample stddev
    assert(r.getLong(3) === 3L)
  }

  test("empty group_by yields one global row; null keys form groups") {
    import AggregateOp.AggSpec
    assert(AggregateOp(sales, Nil, Seq(AggSpec("*", "count", "n"))).count() === 1)
    val withNullKey = Seq((Some("a"), 1L), (None: Option[String], 2L), (None, 3L))
      .toDF("g", "v")
    val out = AggregateOp(withNullKey, Seq("g"), Seq(AggSpec("v", "sum", "s")))
    assert(out.count() === 2) // null key kept as its own group
    assert(out.filter(col("g").isNull).head().getLong(1) === 5L)
  }

  test("unknown op rejected") {
    import AggregateOp.AggSpec
    intercept[IllegalArgumentException] {
      AggregateOp(sales, Nil, Seq(AggSpec("v", "mode", "m")))
    }
  }

  // ------------------------------------------------------ schema validator

  test("SchemaValidator: structural + data-level violations") {
    import graft.schema._
    import graft.schema.GraftType._
    val df = Seq((1L, "x", "RED")).toDF("id", "extra", "color")
    val expected = Seq(
      FieldDef("id", TInteger),
      FieldDef("color", TEnum, enumValues = Seq("RED", "BLUE")),
      FieldDef("missing_col", TString))
    val sv = SchemaValidator.structural(df.schema, expected)
    assert(sv.map(v => (v.kind, v.detail)).toSet ===
      Set(("missing_column", "missing_col"), ("unknown_column", "extra")))

    val ok = Seq((1L, "RED"), (2L, "GREEN")).toDF("id", "color")
    val dv = SchemaValidator.dataViolations(ok, Seq(
      FieldDef("id", TInteger), FieldDef("color", TEnum, enumValues = Seq("RED", "BLUE"))))
    assert(dv === Map("enum:color" -> 1L))

    val nulls = Seq((Some(1L), "a"), (None: Option[Long], "b")).toDF("id", "s")
    val dv2 = SchemaValidator.dataViolations(nulls, Seq(
      FieldDef("id", TInteger), FieldDef("s", TString)))
    assert(dv2 === Map("null:id" -> 1L))

    intercept[IllegalArgumentException] {
      SchemaValidator.enforce(nulls, Seq(FieldDef("id", TInteger), FieldDef("s", TString)))
    }
  }

  test("semi and anti join variants filter without duplicating matches") {
    import SchemaMappingOp.JoinStep
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
    // k=1 matches TWICE: semi must still emit the left row once
    val right = Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("k", "rv")
    val semi = SchemaMappingOp.joinMode(
      Map("l" -> left, "r" -> right),
      Seq(JoinStep("l", "r", Seq("k"), Seq("k"), "semi", "out")))("out")
    assert(semi.columns.toSeq === Seq("k", "lv")) // right columns never appear
    assert(semi.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val anti = SchemaMappingOp.joinMode(
      Map("l" -> left, "r" -> right),
      Seq(JoinStep("l", "r", Seq("k"), Seq("k"), "anti", "out")))("out")
    assert(anti.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("broadcast hint pins a broadcast-hash plan; results identical") {
    import SchemaMappingOp.JoinStep
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "lv")
    val right = Seq((1L, "x"), (3L, "z"), (9L, "q")).toDF("j", "rv")
    // kill auto-broadcast so only the HINT can produce a broadcast plan —
    // proves the config param reaches Catalyst, not that the side is tiny
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def run(hint: Option[String]) = SchemaMappingOp.joinMode(
        Map("l" -> left, "r" -> right),
        Seq(JoinStep("l", "r", Seq("k"), Seq("j"), "inner", "out",
          broadcastSide = hint)))("out")
      val plain = run(None)
      val hinted = run(Some("right"))
      assert(!plain.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assert(hinted.orderBy("k").collect().map(_.toSeq).toSeq ===
        plain.orderBy("k").collect().map(_.toSeq).toSeq)
      // same-name-keys branch takes the hint too
      val sameKey = SchemaMappingOp.joinMode(
        Map("l" -> left, "r" -> right.withColumnRenamed("j", "k")),
        Seq(JoinStep("l", "r", Seq("k"), Seq("k"), "left", "out",
          broadcastSide = Some("right"))))("out")
      assert(sameKey.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assert(sameKey.count() === 4)
      val bad = intercept[IllegalArgumentException] {
        run(Some("both")).count()
      }
      assert(bad.getMessage.contains("left|right"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("rollup and cube groupings equal the union of their grouping sets") {
    import AggregateOp.AggSpec
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L), ("b", "x", 8L))
      .toDF("g1", "g2", "v")
    val aggs = Seq(AggSpec("*", "count", "n"), AggSpec("v", "sum", "s"))
    def canon(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      d.select("g1", "g2", "n", "s").collect().map(_.toSeq).toSet
    val bySet = canon(AggregateOp(df, Seq("g1", "g2"), aggs))
    val byG1 = AggregateOp(df, Seq("g1"), aggs)
      .select(col("g1"), lit(null).as("g2"), col("n"), col("s"))
    val byG2 = AggregateOp(df, Seq("g2"), aggs)
      .select(lit(null).as("g1"), col("g2"), col("n"), col("s"))
    val global = AggregateOp(df, Nil, aggs)
      .select(lit(null).as("g1"), lit(null).as("g2"), col("n"), col("s"))
    assert(canon(AggregateOp(df, Seq("g1", "g2"), aggs, "rollup")) ===
      bySet ++ canon(byG1) ++ canon(global))
    assert(canon(AggregateOp(df, Seq("g1", "g2"), aggs, "cube")) ===
      bySet ++ canon(byG1) ++ canon(byG2) ++ canon(global))
    intercept[IllegalArgumentException] {
      AggregateOp(df, Nil, aggs, "rollup") // grouping sets need keys
    }
    intercept[IllegalArgumentException] {
      AggregateOp(df, Seq("g1"), aggs, "lattice")
    }
  }

  test("pivoted aggregation: one column per declared value, null empty cells") {
    import AggregateOp.AggSpec
    val df = Seq(("p1", "F", 10L), ("p1", "O", 20L), ("p2", "F", 40L))
      .toDF("prio", "status", "v")
    val out = AggregateOp.pivoted(df, Seq("prio"), "status", Seq("F", "O"),
      Seq(AggSpec("v", "sum", "s"))).orderBy("prio").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("p1", "p2"))
    assert((out(0).getLong(1), out(0).getLong(2)) === ((10L, 20L)))
    assert(out(1).getLong(1) === 40L)
    assert(out(1).isNullAt(2)) // p2 has no O rows: null, not 0
    // undeclared values are excluded, not discovered
    val narrow = AggregateOp.pivoted(df, Seq("prio"), "status", Seq("F"),
      Seq(AggSpec("v", "sum", "s")))
    assert(narrow.columns.toSeq === Seq("prio", "F"))
    intercept[IllegalArgumentException] {
      AggregateOp.pivoted(df, Seq("prio"), "status", Nil,
        Seq(AggSpec("v", "sum", "s")))
    }
  }

  test("windowColumn rule set: exclusivity and missing-param failures are loud") {
    import graft.ops.AggregateOp.windowColumn
    // happy paths return a column (analysis happens downstream)
    windowColumn("ts", Some("1 hour"), None, None, "t")
    windowColumn("ts", Some("1 hour"), Some("10 minutes"), None, "t")
    windowColumn("ts", None, None, Some("30 minutes"), "t")
    // session_gap and window are exclusive
    intercept[IllegalArgumentException](
      windowColumn("ts", Some("1 hour"), None, Some("30 minutes"), "t"))
    // session windows do not slide
    intercept[IllegalArgumentException](
      windowColumn("ts", None, Some("10 minutes"), Some("30 minutes"), "t"))
    // slide requires window; bare call needs window or session_gap
    intercept[IllegalArgumentException](
      windowColumn("ts", None, Some("10 minutes"), None, "t"))
    intercept[IllegalArgumentException](
      windowColumn("ts", None, None, None, "t"))
  }

  test("FieldDef ⇄ StructType codec round-trips") {
    import graft.schema._
    import graft.schema.GraftType._
    val fields = Seq(
      FieldDef("id", TInteger),
      FieldDef("tags", TArray, nullable = true,
        item = Some(FieldDef("item", TString, nullable = true))),
      FieldDef("addr", TObject, children = Seq(
        FieldDef("city", TString, nullable = true))))
    val st = FieldDef.toStructType(fields)
    assert(st === StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = true),
      StructField("addr", StructType(Seq(StructField("city", StringType, nullable = true))),
        nullable = false))))
    val back = FieldDef.fromStructType(st)
    assert(back.map(_.name) === Seq("id", "tags", "addr"))
    assert(back(2).children.map(_.name) === Seq("city"))
  }
}
