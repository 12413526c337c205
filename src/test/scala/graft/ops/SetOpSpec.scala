package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins setOp semantics: SQL dedup vs _all multiplicities, and — the
  * load-bearing case — column-order independence: the schema contract
  * upstream is order-insensitive while Dataset.intersect/except match
  * by position, so setOp must align the right side by name. */
class SetOpSpec extends SparkTestBase {
  import spark.implicits._

  private def l = Seq(("1", "x"), ("2", "x"), ("2", "x"), ("3", "y")).toDF("a", "b")

  test("intersect/except dedup; _all variants keep multiplicities") {
    val r = Seq(("2", "x"), ("2", "x"), ("4", "z")).toDF("a", "b")
    assert(RelationalOps.setOp(l, r, "intersect").count() === 1)
    assert(RelationalOps.setOp(l, r, "except").collect()
      .map(_.getString(0)).sorted.toSeq === Seq("1", "3"))
    assert(RelationalOps.setOp(l, r, "except_all").collect()
      .map(_.getString(0)).sorted.toSeq === Seq("1", "3"))
    assert(RelationalOps.setOp(l.limit(0), r, "union_distinct").count() === 2)
  }

  test("right side with reversed column order still compares by NAME") {
    // same rows as l's ("2","x") but columns declared (b, a) — positional
    // matching would compare a against b and return an empty (wrong)
    // intersection
    val reversed = Seq(("x", "2"), ("z", "4")).toDF("b", "a")
    val out = RelationalOps.setOp(l, reversed, "intersect")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("2", "x")))
    assert(RelationalOps.setOp(l, reversed, "except").count() === 2)
  }

  test("missing right column and unknown op are loud") {
    val r = Seq("2").toDF("a")
    intercept[org.apache.spark.sql.AnalysisException] {
      RelationalOps.setOp(l, r, "intersect").collect()
    }
    val e = intercept[IllegalArgumentException] {
      RelationalOps.setOp(l, l, "minus")
    }
    assert(e.getMessage.contains("unknown op"))
  }
}
