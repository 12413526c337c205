package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins WindowOp's contract: rank/lag/running-aggregate values against
  * hand-computed fixtures, the default-frame (peers-included) running
  * sum, the single-exchange plan, and the loud failure modes (global
  * window without opt-in, missing order for order-requiring fns, dest
  * collisions). */
class WindowOpSpec extends SparkTestBase {
  import spark.implicits._

  // two groups with a tie inside g=a: (g, v, id)
  private def df = Seq(
    ("a", 10, 1), ("a", 20, 2), ("a", 20, 3), ("a", 30, 4),
    ("b", 5, 5), ("b", 7, 6)
  ).toDF("g", "v", "id")

  test("row_number / rank / dense_rank over (g, v asc, id asc)") {
    val out = WindowOp(df, Seq("g"), Seq(("v", 1), ("id", 1)), Seq(
      WindowOp.WinFn("row_number", None, 1, "rn"),
      WindowOp.WinFn("rank", None, 1, "rk"),
      WindowOp.WinFn("dense_rank", None, 1, "dr")))
      .orderBy("id").collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    // ties on v share rank (by the v-only key rank would tie; the id
    // tiebreak makes row_number/rank agree here — dense_rank counts
    // distinct (v, id) prefixes the same way)
    assert(out.toSeq === Seq((1, 1, 1, 1), (2, 2, 2, 2), (3, 3, 3, 3),
      (4, 4, 4, 4), (5, 1, 1, 1), (6, 2, 2, 2)))
  }

  test("running sum keeps the SQL default frame: order peers INCLUDED") {
    // order by v ONLY: ids 2 and 3 are peers (v=20) — both running sums
    // must include BOTH peers (RANGE frame), the DuckDB-identical default
    val out = WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
      WindowOp.WinFn("sum", Some("v"), 1, "rsum")))
      .orderBy("id").collect().map(r => (r.getInt(2), r.getLong(3)))
    assert(out.toSeq === Seq((1, 10L), (2, 50L), (3, 50L), (4, 80L),
      (5, 5L), (6, 12L)))
  }

  test("lag/lead with offset and unordered partition aggregates") {
    val out = WindowOp(df, Seq("g"), Seq(("v", 1), ("id", 1)), Seq(
      WindowOp.WinFn("lag", Some("v"), 1, "prev"),
      WindowOp.WinFn("lead", Some("v"), 2, "next2")))
      .orderBy("id").collect()
      .map(r => (r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4)))
    assert(out.toSeq === Seq((1, -1, 20), (2, 10, 30), (3, 20, -1),
      (4, 20, -1), (5, -1, -1), (6, 5, -1)))
    // no order_by: aggregates span the whole partition
    val tot = WindowOp(df, Seq("g"), Nil, Seq(
      WindowOp.WinFn("count", Some("v"), 1, "n"),
      WindowOp.WinFn("max", Some("v"), 1, "mx")))
      .orderBy("id").collect().map(r => (r.getLong(3), r.getInt(4)))
    assert(tot.toSeq === Seq((4L, 30), (4L, 30), (4L, 30), (4L, 30),
      (2L, 7), (2L, 7)))
  }

  test("frame_rows: trailing ROWS window matches the sliding model; guards are loud") {
    // 3-row moving sum under (v, id) order: ROWS frame, ties do NOT merge
    val out = WindowOp(df, Seq("g"), Seq(("v", 1), ("id", 1)), Seq(
      WindowOp.WinFn("sum", Some("v"), 1, "roll", frameRows = Some(3)),
      WindowOp.WinFn("count", Some("v"), 1, "n", frameRows = Some(3))))
      .orderBy("id").collect().map(r => (r.getInt(2), r.getLong(3), r.getLong(4)))
    // g=a ordered: 10,20,20,30 → rolls 10,30,50,70; g=b: 5,7 → 5,12
    assert(out.toSeq === Seq((1, 10L, 1L), (2, 30L, 2L), (3, 50L, 3L),
      (4, 70L, 3L), (5, 5L, 1L), (6, 12L, 2L)))
    // frame_rows=1 is the degenerate single-row frame: sum == src
    val one = WindowOp(df, Seq("g"), Seq(("v", 1), ("id", 1)), Seq(
      WindowOp.WinFn("sum", Some("v"), 1, "self", frameRows = Some(1))))
      .orderBy("id").collect().map(r => (r.getInt(1), r.getLong(3)))
    assert(one.forall { case (v, s) => s == v.toLong })
    val e1 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
        WindowOp.WinFn("row_number", None, 1, "rn", frameRows = Some(3))))
    }
    assert(e1.getMessage.contains("frame_rows only applies to aggregates"))
    val e2 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Nil, Seq(
        WindowOp.WinFn("sum", Some("v"), 1, "roll", frameRows = Some(3))))
    }
    assert(e2.getMessage.contains("order_by"))
    val e3 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
        WindowOp.WinFn("sum", Some("v"), 1, "roll", frameRows = Some(0))))
    }
    assert(e3.getMessage.contains("frame_rows must be >= 1"))
  }

  test("plan: one hash exchange on the partition keys feeds the Window exec") {
    val plan = WindowOp(df.repartition(4), Seq("g"), Seq(("v", 1)), Seq(
      WindowOp.WinFn("row_number", None, 1, "rn")))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(g".r.findAllIn(plan).size >= 1, plan)
    assert(plan.contains("Window"), plan)
  }

  test("failure modes are loud") {
    val e1 = intercept[IllegalArgumentException] {
      WindowOp(df, Nil, Seq(("v", 1)),
        Seq(WindowOp.WinFn("row_number", None, 1, "rn")))
    }
    assert(e1.getMessage.contains("allow_global"))
    // global opt-in works
    assert(WindowOp(df, Nil, Seq(("v", 1), ("id", 1)),
      Seq(WindowOp.WinFn("row_number", None, 1, "rn")), allowGlobal = true)
      .count() === 6)
    val e2 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Nil, Seq(WindowOp.WinFn("rank", None, 1, "rk")))
    }
    assert(e2.getMessage.contains("order_by"))
    val e3 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
        WindowOp.WinFn("lag", None, 1, "prev")))
    }
    assert(e3.getMessage.contains("src"))
    val e4 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
        WindowOp.WinFn("row_number", None, 1, "v")))
    }
    assert(e4.getMessage.contains("already has"))
    val e5 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
        WindowOp.WinFn("row_number", None, 1, "x"),
        WindowOp.WinFn("rank", None, 1, "x")))
    }
    assert(e5.getMessage.contains("duplicate dest"))
    val e6 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
        WindowOp.WinFn("median", Some("v"), 1, "m")))
    }
    assert(e6.getMessage.contains("unknown function"))
  }

  test("percent_rank / cume_dist / ntile: SQL semantics, ntile bucket guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 10), ("a", 20), ("a", 30), ("a", 40), ("b", 5))
      .toDF("g", "v")
    val out = WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
      WindowOp.WinFn("percent_rank", None, 0, "pct"),
      WindowOp.WinFn("cume_dist", None, 0, "cd"),
      WindowOp.WinFn("ntile", None, 2, "bucket")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).sortBy(t => (t._1, t._2))
    // group a: pct = (rank-1)/3, cd = rank/4, ntile(2) halves
    assert(out(0) === (("a", 10, 0.0, 0.25, 1)))
    assert(out(1) === (("a", 20, 1.0 / 3, 0.5, 1)))
    assert(out(2) === (("a", 30, 2.0 / 3, 0.75, 2)))
    assert(out(3) === (("a", 40, 1.0, 1.0, 2)))
    // single-row group: percent_rank is 0 (SQL rule), cume_dist 1
    assert(out(4) === (("b", 5, 0.0, 1.0, 1)))
    val e = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Seq(("v", 1)), Seq(
        WindowOp.WinFn("ntile", None, 0, "b")))
    }
    assert(e.getMessage.contains("bucket count"))
    val e2 = intercept[IllegalArgumentException] {
      WindowOp(df, Seq("g"), Nil, Seq(
        WindowOp.WinFn("percent_rank", None, 0, "p")))
    }
    assert(e2.getMessage.contains("order_by"))
  }
}
