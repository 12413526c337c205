package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins RangeJoin's contract: one-to-many interval containment with
  * inclusive bounds, left-join nulls, suffixing, the loud failure modes,
  * and the two plan shapes (keyed: no nested loop; keyless: broadcast
  * nested loop against the broadcast interval side). */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  // events at t=1..6 for two keys; intervals [2,4] tagged A and [4,6] B
  private def left = Seq(
    ("k1", 1), ("k1", 2), ("k1", 4), ("k1", 5),
    ("k2", 3), ("k2", 7)
  ).toDF("k", "t")

  private def right = Seq(
    ("k1", 2, 4, "A"), ("k1", 4, 6, "B"), ("k2", 1, 3, "C")
  ).toDF("k", "s", "e", "tag")

  test("keyed inner: inclusive bounds, overlap yields one row per interval") {
    val out = RangeJoin(left, right, on = "t", start = "s", end = "e", by = Seq("k"))
      .select(col("k"), col("t"), col("tag"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    // t=4 on k1 is in BOTH [2,4] and [4,6] — two rows
    assert(out.toSeq === Seq(
      ("k1", 2, "A"), ("k1", 4, "A"), ("k1", 4, "B"), ("k1", 5, "B"),
      ("k2", 3, "C")))
  }

  test("left join keeps unmatched rows with null right columns") {
    val out = RangeJoin(left, right, "t", "s", "e", Seq("k"), joinType = "left")
    assert(out.count() === 7) // 5 matches + t=1(k1) and t=7(k2) unmatched
    val unmatched = out.filter(col("tag").isNull)
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted
    assert(unmatched.toSeq === Seq(("k1", 1), ("k2", 7)))
  }

  test("keyed plan carries the range inside the equi-join: no nested loop") {
    val plan = RangeJoin(left, right, "t", "s", "e", Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"keyed range join must not cross-product:\n$plan")
    // positively: the keys hash — one of Spark's equi-join operators
    assert(Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        .exists(plan.contains),
      s"keyed range join must compile to an equi-join operator:\n$plan")
  }

  test("keyless plan broadcasts the interval side (nested loop by construction)") {
    val plan = RangeJoin(left.select(col("t")), right.select(col("s"), col("e"), col("tag")),
      "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"keyless range join must broadcast the interval side:\n$plan")
  }

  test("left join over SHARED-LINEAGE sides keeps the left by-key (self-join regression)") {
    import spark.implicits._
    // both sides derived from the same frame: Spark's attribute dedup
    // made drop-by-reference remove the LEFT key, nulling it on every
    // unmatched row (caught by the q_range_join_left oracle gate)
    val base = Seq(("k1", 1, "ev"), ("k1", 3, "win"), ("k2", 9, "ev"))
      .toDF("k", "t", "kind")
    val l = base.filter(col("kind") === "ev").select(col("k"), col("t"))
    val r = base.filter(col("kind") === "win")
      .select(col("k"), (col("t") - 1).as("s"), (col("t") + 1).as("e"))
    val out = RangeJoin(l, r, "t", "s", "e", Seq("k"), joinType = "left")
    assert(out.columns.count(_ == "k") === 1)
    // the renamed-key condition must still be an equi-join, not a
    // nested loop, under shared lineage too
    assert(!out.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val rows = out.select(col("k"), col("t"), col("s"))
      .collect().map(x => (x.getString(0), x.getInt(1), if (x.isNullAt(2)) None else Some(x.getInt(2))))
      .sortBy(x => (x._1, x._2))
    // k is the LEFT key: never null, even on the two unmatched rows
    assert(rows.toSeq === Seq(("k1", 1, None), ("k2", 9, None)))
  }

  test("collisions suffix; failure modes are loud") {
    val r2 = right.withColumnRenamed("tag", "t") // collides with left's t
    val out = RangeJoin(left, r2, "t", "s", "e", Seq("k"))
    assert(out.columns.contains("t_r"))
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin(left, right, "t", "s", "e", Seq("k"), joinType = "full")
    }
    assert(e1.getMessage.contains("inner|left"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin(left, right, "nope", "s", "e", Seq("k"))
    }
    assert(e2.getMessage.contains("left time column"))
    val e3 = intercept[IllegalArgumentException] {
      RangeJoin(left, right, "t", "s", "e", Seq("missing"))
    }
    assert(e3.getMessage.contains("by-key"))
    val e4 = intercept[IllegalArgumentException] {
      RangeJoin(left.withColumn("s", col("t")), right, "t", "s", "e", Seq("s"))
    }
    assert(e4.getMessage.contains("cannot also be by-keys"))
  }

  test("null on / null bounds / null keys never match") {
    val l = Seq((Some("k1"), Some(2)), (None, Some(2)), (Some("k1"), None))
      .toDF("k", "t")
    val r = Seq((Some("k1"), Some(1), Some(3), "A"), (Some("k1"), None, Some(9), "N"))
      .toDF("k", "s", "e", "tag")
    val out = RangeJoin(l, r, "t", "s", "e", Seq("k"))
      .select(col("tag")).collect().map(_.getString(0))
    assert(out.toSeq === Seq("A")) // only the fully non-null row matches
  }
}
