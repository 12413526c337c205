package graft.ops

import graft.SparkTestBase
import graft.schema.GraftType
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property tests for the operator kernels against independent Scala models
 * of the documented semantics (SURVEY.md §2.1.1/§2.1.3) — the test layer
 * the reference lacks (SURVEY.md §5: no hypothesis/property tests there).
 *
 * Strategy: draw a few hundred random inputs per property with a FIXED
 * ScalaCheck seed (deterministic, so a failure reproduces), evaluate the
 * whole batch in ONE Spark job, and compare element-wise against the
 * model. One job per property keeps the suite fast; the model is written
 * from the semantics doc, not from the implementation.
 *
 * Generators constrain the alphabet where Spark's string-parse acceptance
 * has long-tail forms (hex, underscores, sci-notation corner cases) that
 * the reference semantics never see from real configs — the properties
 * pin the documented domain, unit specs pin the named edge cases.
 */
class OpsPropertySpec extends SparkTestBase {

  private def sampleN[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, next) = (g.pureApply(params, s), s.next)
      (next, Some(v))
    }.drop(1).take(n).flatMap(_._2).toSeq
  }

  // ------------------------------------------------------ type_conversion

  /** Cell generator: numerics, floats, bool words, null-ish, padded and
    * garbage tokens — the domain a real string column feeds the caster. */
  private val cellGen: Gen[String] = {
    val smallInt = Gen.chooseNum(-999999999L, 999999999L).map(_.toString)
    val floaty = for {
      a <- Gen.chooseNum(-99999L, 99999L); b <- Gen.chooseNum(0, 9999)
    } yield s"$a.$b"
    val intDotZero = Gen.chooseNum(-99999L, 99999L).map(i => s"$i.0")
    val boolWord = Gen.oneOf("true", "t", "1", "yes", "y", "false", "f", "0",
      "no", "n", "TRUE", "False", "YES", "No", "T", "F", "Y", "N")
    val nullish = Gen.oneOf("", "na", "nan", "null", "none", "NA", "NaN",
      "NULL", "None", " null ", "  ", "\tna\t")
    val garbage = Gen.nonEmptyListOf(Gen.oneOf('g', 'h', 'x', 'z', '-', '.'))
      .map(_.mkString.take(8))
    val padded = smallInt.map(s => s"  $s ")
    Gen.frequency(4 -> smallInt, 3 -> floaty, 2 -> intDotZero, 3 -> boolWord,
      3 -> nullish, 3 -> garbage, 2 -> padded)
  }

  private def normalize(s: String): Option[String] = {
    val t = s.trim.toLowerCase
    if (Set("", "na", "nan", "null", "none").contains(t)) None else Some(s)
  }
  private val longRe = "^[+-]?\\d+$".r
  private val dblRe = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$".r
  private def parseLong(s: String): Option[Long] =
    longRe.findFirstIn(s.trim).map(_.toLong)
  private def parseDouble(s: String): Option[Double] =
    dblRe.findFirstIn(s.trim).map(_.toDouble)

  /** Model of §2.1.3 string→INTEGER: int parse, else float-if-integral. */
  private def modelToInt(s: String): Option[Long] =
    normalize(s).flatMap { v =>
      parseLong(v).orElse(parseDouble(v).filter(d => d == math.floor(d) &&
        d >= Long.MinValue.toDouble && d <= Long.MaxValue.toDouble).map(_.toLong))
    }
  private def modelToFloat(s: String): Option[Double] =
    normalize(s).flatMap(parseDouble)
  private def modelToBool(s: String): Option[Boolean] =
    normalize(s).map(_.trim.toLowerCase).flatMap {
      case "true" | "t" | "1" | "yes" | "y" => Some(true)
      case "false" | "f" | "0" | "no" | "n" => Some(false)
      case _                                => None
    }

  private def convertBatch(cells: Seq[String], target: GraftType): Seq[Option[Any]] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cells.zipWithIndex.map { case (s, i) => Row(i, s) }, 2),
      StructType(Seq(StructField("i", IntegerType), StructField("s", StringType))))
    val out = TypeConversionOp(df,
      Seq(TypeConversionOp.CastRule("s", target, TypeConversionOp.NullPolicy)))
    out.orderBy(col("i")).collect().map(r => Option(r.get(1))).toSeq
  }

  test("string→integer matches the scalar-semantics model (on_error=null)") {
    val cells = sampleN(cellGen, 400, seed = 11L)
    val got = convertBatch(cells, GraftType.TInteger)
    cells.lazyZip(got).foreach { (s, g) =>
      assert(g == modelToInt(s), s"input '$s': spark=$g model=${modelToInt(s)}")
    }
  }

  test("string→float matches the scalar-semantics model (on_error=null)") {
    val cells = sampleN(cellGen, 400, seed = 12L)
    val got = convertBatch(cells, GraftType.TFloat)
    cells.lazyZip(got).foreach { (s, g) =>
      assert(g == modelToFloat(s), s"input '$s': spark=$g model=${modelToFloat(s)}")
    }
  }

  test("string→boolean matches the scalar-semantics model (on_error=null)") {
    val cells = sampleN(cellGen, 400, seed = 13L)
    val got = convertBatch(cells, GraftType.TBoolean)
    cells.lazyZip(got).foreach { (s, g) =>
      assert(g == modelToBool(s), s"input '$s': spark=$g model=${modelToBool(s)}")
    }
  }

  test("staged top-level and nested-path string conversion agree") {
    // the top-level path runs the STAGED projections (convertStagedString),
    // the dotted path runs convert() through the struct rebuild — both
    // claim the same scalar semantics; this pins it over the full random
    // cell domain for every string-source target
    val cells = sampleN(cellGen, 400, seed = 14L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cells.zipWithIndex.map { case (s, i) =>
        Row(i, s, Row(s)) }, 2),
      StructType(Seq(StructField("i", IntegerType), StructField("s", StringType),
        StructField("o", StructType(Seq(StructField("v", StringType)))))))
    for (target <- Seq(GraftType.TInteger, GraftType.TFloat, GraftType.TBoolean)) {
      val out = TypeConversionOp(df, Seq(
        TypeConversionOp.CastRule("s", target, TypeConversionOp.NullPolicy),
        TypeConversionOp.CastRule("o.v", target, TypeConversionOp.NullPolicy)))
        .orderBy(col("i"))
        .select(col("s"), col("o.v").as("v")).collect()
      out.zip(cells).foreach { case (r, cell) =>
        assert(Option(r.get(0)) == Option(r.get(1)),
          s"target $target input '$cell': top=${r.get(0)} nested=${r.get(1)}")
      }
    }
  }

  // --------------------------------------------------------------- filter

  /** Row model: nullable long `a`, nullable string `b`. */
  private case class R(id: Int, a: Option[Long], b: Option[String])

  private val rowGen: Gen[(Option[Long], Option[String])] = for {
    a <- Gen.option(Gen.chooseNum(-5L, 5L))
    b <- Gen.option(Gen.oneOf("Alpha", "beta", "GAMMA", "delta", "", "alphabet"))
  } yield (a, b)

  /** Random rule trees: leaves over `a` (ordered ops + ==/!=/isin) and
    * `b` (==/!=/contains), NOT/AND/OR nodes, depth ≤ 3. */
  private def leafGen: Gen[FilterOp.Rule] = {
    val aOrdered = for {
      op <- Gen.oneOf(">", "<", ">=", "<=", "==", "!=")
      v <- Gen.chooseNum(-5L, 5L)
    } yield FilterOp.Leaf("a", op, v)
    val aIsin = Gen.nonEmptyListOf(Gen.chooseNum(-5L, 5L)).map(vs =>
      FilterOp.Leaf("a", "==", vs.distinct))
    val bLeaf = for {
      op <- Gen.oneOf("==", "!=", "contains")
      v <- Gen.oneOf("Alpha", "beta", "alpha", "LPH", "et", "x")
    } yield FilterOp.Leaf("b", op, v)
    Gen.frequency(4 -> aOrdered, 1 -> aIsin, 3 -> bLeaf)
  }
  private def treeGen(depth: Int): Gen[FilterOp.Rule] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      1 -> Gen.listOfN(2, treeGen(depth - 1)).map(FilterOp.Node("AND", _)),
      1 -> Gen.listOfN(2, treeGen(depth - 1)).map(FilterOp.Node("OR", _)),
      1 -> treeGen(depth - 1).map(r => FilterOp.Node("NOT", Seq(r))))

  /** Two-valued leaf semantics of §2.1.1: null is falsy everywhere except
    * `!=`, where a null row passes (pandas NaN != v). */
  private def evalLeaf(r: R, l: FilterOp.Leaf): Boolean = (l.column, l.op, l.value) match {
    case ("a", op, v: Long) => r.a match {
      case None => op == "!="
      case Some(x) => op match {
        case "==" => x == v
        case "!=" => x != v
        case ">"  => x > v
        case "<"  => x < v
        case ">=" => x >= v
        case "<=" => x <= v
      }
    }
    case ("a", "==", vs: Seq[_]) => r.a.exists(x => vs.contains(x))
    case ("b", op, v: String) => r.b match {
      case None => op == "!="
      case Some(x) => op match {
        case "==" => x == v
        case "!=" => x != v
        case "contains" => x.toLowerCase.contains(v.toLowerCase)
      }
    }
    case other => throw new IllegalStateException(s"unexpected leaf $other")
  }
  private def evalRule(r: R, rule: FilterOp.Rule): Boolean = rule match {
    case l: FilterOp.Leaf => evalLeaf(r, l)
    case FilterOp.Node("AND", rs) => rs.forall(evalRule(r, _))
    case FilterOp.Node("OR", rs)  => rs.exists(evalRule(r, _))
    case FilterOp.Node("NOT", Seq(x)) => !evalRule(r, x)
    case other => throw new IllegalStateException(s"unexpected node $other")
  }

  test("random rule trees: compiled predicate matches the pandas-mask model") {
    val rows = sampleN(rowGen, 60, seed = 21L).zipWithIndex.map { case ((a, b), i) =>
      R(i, a, b)
    }
    val trees = sampleN(treeGen(3), 50, seed = 22L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r.id, r.a.map(Long.box).orNull, r.b.orNull)), 2),
      StructType(Seq(StructField("id", IntegerType),
        StructField("a", LongType), StructField("b", StringType))))
    // one job: every tree evaluated as its own column next to the id
    val cols = col("id") +: trees.zipWithIndex.map { case (t, i) =>
      // two-valued at the ROOT too: the graph layer routes pass = cond,
      // fail = !cond over the same compiled column
      FilterOp.compile(t).as(s"t$i")
    }
    val got = df.select(cols: _*).orderBy(col("id")).collect()
    for ((t, i) <- trees.zipWithIndex; row <- got) {
      val r = rows(row.getInt(0))
      val sparkV = row.getBoolean(i + 1)
      val modelV = evalRule(r, t)
      assert(sparkV == modelV,
        s"tree #$i $t on row $r: spark=$sparkV model=$modelV")
    }
  }
}
