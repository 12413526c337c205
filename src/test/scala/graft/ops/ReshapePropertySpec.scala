package graft.ops

import graft.SparkTestBase
import graft.ops.AggregateOp.AggSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property tests for the reshape pair — AggregateOp.pivoted and
 * RelationalOps.unpivot — against independent Scala models of the
 * documented semantics, in the OpsPropertySpec style: a FIXED seed,
 * one Spark job per property, model written from the semantics doc
 * (AggregateOp.scala pivot scaladoc; RelationalOps.scala unpivot
 * scaladoc), not from the implementation.
 *
 * The two semantics this file exists to pin:
 *  - pivot's null-vs-0 count divergence: a (group, pivot-value) CELL with
 *    no input rows is null for EVERY agg — including count, where a SQL
 *    FILTER aggregate would say 0; a cell that has rows but only null
 *    values counts 0 (and sums null).
 *  - unpivot RETAINS null cells (one output row per id×valueCol, always)
 *    — unlike SQL UNPIVOT, which drops them unless INCLUDE NULLS.
 */
class ReshapePropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sampleN[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, next) = (g.pureApply(params, s), s.next)
      (next, Some(v))
    }.drop(1).take(n).flatMap(_._2).toSeq
  }

  // ------------------------------------------------------------- pivot

  /** (group, pivotCol, value): few group keys incl. null, a pivot domain
    * wider than the declared pivot_values (extra values must vanish, not
    * widen the schema), and null-heavy values to hit the count-0 cells. */
  private val pivotRowGen: Gen[(Option[String], String, Option[Long])] = for {
    g <- Gen.option(Gen.oneOf("g1", "g2", "g3"))
    p <- Gen.oneOf("a", "b", "c", "d") // declared: a, b, c — d must drop
    v <- Gen.frequency(3 -> Gen.chooseNum(-100L, 100L).map(Some(_)),
      2 -> Gen.const(None))
  } yield (g, p, v)

  private val pivotValues = Seq("a", "b", "c")

  test("pivot matches a per-cell model incl. the null-vs-0 count cell " +
    "(multi-agg naming <value>_<dest>)") {
    val rows = sampleN(pivotRowGen, 300, seed = 41L)
    val df = rows.toDF("g", "p", "v")
    val out = AggregateOp.pivoted(df, Seq("g"), "p", pivotValues,
      Seq(AggSpec("v", "sum", "sv"), AggSpec("v", "count", "nv")))
    // multi-agg: one column per pivot value per agg dest
    assert(out.columns.toSeq === Seq("g",
      "a_sv", "a_nv", "b_sv", "b_nv", "c_sv", "c_nv"))

    val got = out.collect().map { r =>
      Option(r.getAs[String]("g")) ->
        pivotValues.map(v => (Option(r.getAs[Any](s"${v}_sv")),
          Option(r.getAs[Any](s"${v}_nv"))))
    }.toMap

    val groups = rows.map(_._1).distinct
    assert(got.keySet === groups.toSet, "one output row per group key incl. null")
    for (g <- groups; (pv, i) <- pivotValues.zipWithIndex) {
      val cell = rows.filter(r => r._1 == g && r._2 == pv)
      val nonNull = cell.flatMap(_._3)
      val (expSum, expCnt): (Option[Any], Option[Any]) =
        if (cell.isEmpty) (None, None) // NO rows → null even for count
        else (if (nonNull.isEmpty) None else Some(nonNull.sum),
          Some(nonNull.size.toLong)) // rows but all-null values → count 0
      assert(got(g)(i) === ((expSum, expCnt)),
        s"cell (g=$g, p=$pv): ${cell.size} rows, ${nonNull.size} non-null")
    }
  }

  test("pivot single-agg columns are named by the pivot value alone") {
    val df = Seq(("g1", "a", 1L), ("g1", "b", 2L)).toDF("g", "p", "v")
    val out = AggregateOp.pivoted(df, Seq("g"), "p", pivotValues,
      Seq(AggSpec("v", "sum", "sv")))
    assert(out.columns.toSeq === Seq("g", "a", "b", "c"))
  }

  // ----------------------------------------------------------- unpivot

  private val unpivotRowGen: Gen[(Long, Option[Long], Option[Long], Option[Long])] =
    for {
      id <- Gen.chooseNum(0L, 10000L)
      a <- Gen.option(Gen.chooseNum(-100L, 100L))
      b <- Gen.option(Gen.chooseNum(-100L, 100L))
      c <- Gen.option(Gen.chooseNum(-100L, 100L))
    } yield (id, a, b, c)

  test("unpivot matches the row-explode model and RETAINS null cells") {
    val rows = sampleN(unpivotRowGen, 300, seed = 42L)
      .zipWithIndex.map { case ((_, a, b, c), i) => (i.toLong, a, b, c) }
    val df = rows.toDF("id", "va", "vb", "vc")
    val out = RelationalOps.unpivot(df, ids = Seq("id"),
      valueCols = Seq("va", "vb", "vc"), varName = "m", valueName = "x")
    assert(out.columns.toSeq === Seq("id", "m", "x"))
    val got = out.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(r => (r._1, r._2))
    val model = rows.flatMap { case (id, a, b, c) =>
      Seq((id, "va", a), (id, "vb", b), (id, "vc", c))
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq === model, "every id×valueCol must emit exactly one row")
  }

  test("pivot(unpivot) roundtrips a dense single-value-per-cell frame") {
    // the inverse-pair claim in the scaladocs, pinned on a frame where it
    // actually holds: unique ids, every cell present and non-null
    val rows = (0L until 40L).map(id => (id, id * 3 + 1, id * 5 + 2))
    val df = rows.toDF("id", "va", "vb")
    val melted = RelationalOps.unpivot(df, Seq("id"), Seq("va", "vb"))
    val back = AggregateOp.pivoted(melted, Seq("id"), "variable",
      Seq("va", "vb"), Seq(AggSpec("value", "sum", "s")))
    val got = back.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === rows)
  }

  test("unpivot rejects value columns with no common type, loudly") {
    val df = Seq((1L, 2L, "x")).toDF("id", "v_num", "v_str")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      RelationalOps.unpivot(df, Seq("id"), Seq("v_num", "v_str")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("unpivot"))
  }

  test("hashSplit: disjoint, exhaustive, deterministic, roughly proportional") {
    val df = (0L until 2000L).toDF("id")
    val splits = RelationalOps.hashSplit(df, "id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val sets = splits.view.mapValues(_.collect().map(_.getLong(0)).toSet).toMap
    // every row in exactly one split
    assert(sets.values.map(_.size).sum === 2000)
    assert(sets.values.reduce(_ ++ _).size === 2000)
    // a rerun routes identically (md5 of the id, not sampling)
    val again = RelationalOps.hashSplit(df, "id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .view.mapValues(_.collect().map(_.getLong(0)).toSet).toMap
    assert(again === sets)
    // proportions within a loose band (md5 is uniform; 2000 rows)
    assert(sets("train").size > 1500 && sets("train").size < 1750,
      s"train=${sets("train").size}")
    assert(sets("val").size > 120 && sets("val").size < 280)
  }

  test("hashSplit routes null ids to the last split instead of dropping them") {
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val splits = RelationalOps.hashSplit(df, "id",
      Seq(("train", 0.8), ("rest", 0.2)))
    val total = splits.values.map(_.count()).sum
    assert(total === 3, "a splitter must never lose rows")
    assert(splits("rest").filter(col("id").isNull).count() === 1,
      "the null id belongs to the LAST split (the oracle's ELSE branch)")
  }

  test("hashSplit validates fractions loudly") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      RelationalOps.hashSplit(df, "id", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      RelationalOps.hashSplit(df, "id", Seq(("a", 0.5), ("a", 0.5)))
    }
    intercept[IllegalArgumentException] {
      RelationalOps.hashSplit(df, "id", Nil)
    }
  }

  test("hashSample: deterministic subset, seed-dependent, roughly proportional") {
    val df = (0L until 2000L).toDF("id")
    val ids = (s: org.apache.spark.sql.DataFrame) => s.collect().map(_.getLong(0)).toSet
    val kept = ids(RelationalOps.hashSample(df, "id", 0.25, seed = "a"))
    // a rerun keeps exactly the same rows (md5 of the id, not sampling)
    assert(ids(RelationalOps.hashSample(df, "id", 0.25, seed = "a")) === kept)
    assert(kept.size > 380 && kept.size < 620, s"kept=${kept.size}")
    // another seed draws a genuinely different sample at the same rate
    val other = ids(RelationalOps.hashSample(df, "id", 0.25, seed = "b"))
    assert(other !== kept)
    assert((kept intersect other).size < kept.size)
    // rate edges: 0 keeps nothing, 1 keeps everything
    assert(RelationalOps.hashSample(df, "id", 0.0).count() === 0)
    assert(RelationalOps.hashSample(df, "id", 1.0).count() === 2000)
  }

  test("hashSample applies per-stratum rates; null stratum uses the default") {
    val df = (0L until 3000L).map(i => (i, i % 3 match {
      case 0 => "keep_all"; case 1 => "drop_all"; case 2 => null
    })).toDF("id", "lang")
    val out = RelationalOps.hashSample(df, "id", 0.5, seed = "s",
      strataCol = Some("lang"),
      strataFractions = Seq(("keep_all", 1.0), ("drop_all", 0.0)))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(byLang("keep_all") === 1000L, "rate-1.0 stratum keeps every row")
    assert(!byLang.contains("drop_all"), "rate-0.0 stratum keeps none")
    assert(byLang("NULL") > 400 && byLang("NULL") < 600,
      s"null stratum samples at the default rate: ${byLang.get("NULL")}")
  }

  test("hashSample null ids: kept only at an effective rate of 1.0") {
    val df = Seq((Some(1L), "a"), (Some(2L), "a"), (None, "a")).toDF("id", "lang")
    assert(RelationalOps.hashSample(df, "id", 0.9999)
      .filter(col("id").isNull).count() === 0)
    assert(RelationalOps.hashSample(df, "id", 1.0)
      .filter(col("id").isNull).count() === 1)
  }

  test("hashSample validates rates loudly") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      RelationalOps.hashSample(df, "id", 1.5)
    }
    intercept[IllegalArgumentException] {
      RelationalOps.hashSample(df, "id", 0.5, strataCol = Some("lang"),
        strataFractions = Seq(("a", -0.1)))
    }
    intercept[IllegalArgumentException] { // strata rates without a column
      RelationalOps.hashSample(df, "id", 0.5, strataFractions = Seq(("a", 0.5)))
    }
    intercept[IllegalArgumentException] {
      RelationalOps.hashSample(df, "id", 0.5, strataCol = Some("lang"),
        strataFractions = Seq(("a", 0.5), ("a", 0.6)))
    }
  }

  test("budgetSample: deterministic per-group md5-order prefix under the budget") {
    import org.apache.spark.sql.functions.col
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "a" else "b", 10L))
      .toDF("id", "grp", "cost")
    val out = RelationalOps.budgetSample(df, "id", "cost", 200L,
      by = Seq("grp"), seed = "x")
    // 10 cost each, 200 budget → exactly 20 survivors per group
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp === Map("a" -> 20L, "b" -> 20L))
    // reruns keep the same rows; another seed draws a different prefix
    val ids = (d: org.apache.spark.sql.DataFrame) =>
      d.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(RelationalOps.budgetSample(df, "id", "cost", 200L,
      Seq("grp"), "x")) === ids(out))
    assert(ids(RelationalOps.budgetSample(df, "id", "cost", 200L,
      Seq("grp"), "y")) !== ids(out))
    // the selection is the PREFIX of the md5 order: every kept group
    // total is <= budget and adding any dropped row would overflow
    val kept = out.groupBy("grp")
      .agg(org.apache.spark.sql.functions.sum("cost").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.values.forall(_ <= 200L))
    // budget 0 keeps nothing; budget >= total keeps everything
    assert(RelationalOps.budgetSample(df, "id", "cost", 0L, Seq("grp")).count() === 0)
    assert(RelationalOps.budgetSample(df, "id", "cost", 10000L, Seq("grp")).count() === 300)
  }

  test("budgetSample: null costs are free, null ids keyed like shuffle, guards") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(1L), "a", Some(5L)), (Some(2L), "a", None),
      (None, "a", Some(5L))).toDF("id", "grp", "cost")
    // budget 10: null cost consumes nothing, so all three fit (5+0+5)
    assert(RelationalOps.budgetSample(df, "id", "cost", 10L, Seq("grp")).count() === 3)
    // budget 5: only the md5-order prefix summing to <= 5 survives
    assert(RelationalOps.budgetSample(df, "id", "cost", 5L, Seq("grp")).count() < 3)
    intercept[IllegalArgumentException] {
      RelationalOps.budgetSample(df, "id", "cost", -1L, Seq("grp"))
    }
    // empty by without allow_global is the single-partition trap — loud
    val ex = intercept[IllegalArgumentException] {
      RelationalOps.budgetSample(df, "id", "cost", 10L, Nil)
    }
    assert(ex.getMessage.contains("allow_global"))
    assert(RelationalOps.budgetSample(df, "id", "cost", 100L, Nil,
      allowGlobal = true).count() === 3)
  }

  test("budgetSample plan: ONE hash exchange on the mixing key, nothing more") {
    val df = (0L until 100L).map(i => (i, s"g${i % 4}", 1L))
      .toDF("id", "grp", "cost")
    val plan = RelationalOps.budgetSample(df, "id", "cost", 10L, Seq("grp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(grp"),
      s"window must partition on the mixing key:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"exactly one exchange expected:\n$plan")
  }

  test("mixSample: floored weight shares, budgetSample-identical selection") {
    // sources a/b/c at cost 10/row; weights 2:1:1 over budget 400
    // → per-source budgets 200/100/100 → 20/10/10 survivors
    val df = (0L until 300L).map(i =>
      (i, Seq("a", "b", "c")(i.toInt % 3), 10L)).toDF("id", "src", "cost")
    val out = RelationalOps.mixSample(df, "id", "cost", 400L, "src",
      Seq("a" -> 2.0, "b" -> 1.0, "c" -> 1.0), seed = "x")
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc === Map("a" -> 20L, "b" -> 10L, "c" -> 10L))
    // weight scale is irrelevant (normalized internally)
    val ids = (d: org.apache.spark.sql.DataFrame) =>
      d.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(RelationalOps.mixSample(df, "id", "cost", 400L, "src",
      Seq("a" -> 50.0, "b" -> 25.0, "c" -> 25.0), "x")) === ids(out))
    // per-source selection IS budgetSample's rule at that source's share
    assert(ids(out.filter($"src" === "a")) ===
      ids(RelationalOps.budgetSample(df.filter($"src" === "a"),
        "id", "cost", 200L, Seq("src"), "x")))
    // reruns agree; another seed draws a different prefix
    assert(ids(RelationalOps.mixSample(df, "id", "cost", 400L, "src",
      Seq("a" -> 2.0, "b" -> 1.0, "c" -> 1.0), "x")) === ids(out))
    assert(ids(RelationalOps.mixSample(df, "id", "cost", 400L, "src",
      Seq("a" -> 2.0, "b" -> 1.0, "c" -> 1.0), "y")) !== ids(out))
  }

  test("mixSample: unlisted and null sources drop; guards are loud") {
    val df = Seq((Some(1L), Some("a"), Some(10L)), (Some(2L), Some("zz"), Some(10L)),
      (Some(3L), None, Some(10L)), (Some(4L), Some("a"), None))
      .toDF("id", "src", "cost")
    // 'zz' is unlisted, null source matches nothing: only 'a' rows can
    // survive; the null-cost row is free and fits alongside id=1
    val out = RelationalOps.mixSample(df, "id", "cost", 100L, "src",
      Seq("a" -> 1.0))
    assert(out.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    intercept[IllegalArgumentException] {
      RelationalOps.mixSample(df, "id", "cost", -1L, "src", Seq("a" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      RelationalOps.mixSample(df, "id", "cost", 10L, "src", Nil)
    }
    intercept[IllegalArgumentException] { // zero/negative/NaN weights
      RelationalOps.mixSample(df, "id", "cost", 10L, "src", Seq("a" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      RelationalOps.mixSample(df, "id", "cost", 10L, "src",
        Seq("a" -> 1.0, "a" -> 2.0))
    }
    intercept[IllegalArgumentException] { // reserved temp column
      RelationalOps.mixSample(df.withColumn("__mix_run", lit(1)),
        "id", "cost", 10L, "src", Seq("a" -> 1.0))
    }
  }

  test("mixSample plan: source prefilter pushed to the scan + ONE hash exchange") {
    // a real parquet scan (a LocalRelation would constant-fold the
    // prefilter away and hide what we're pinning): unlisted sources must
    // be dropped AT THE SCAN — PushedFilters carries the In — so at a
    // 300-source corpus mixing 2 sources, the other 298 never shuffle
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = RelationalOps.mixSample(docs, "doc_id", "n_chars", 1000L,
      "source", Seq("src0" -> 1.0, "src1" -> 1.0))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"),
      s"window must partition on the source key:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"exactly one exchange expected (unlisted sources filter BEFORE it):\n$plan")
    assert(plan.contains("PushedFilters: [In(source"),
      s"the source prefilter must reach the parquet scan:\n$plan")
  }
}
