package graft.scale

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile counts rows, nulls, distincts and ranges in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(-1.0)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(7.25)))
      .toDF("id", "tag", "score")
    val out = Profile.profile(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
    assert(out(0) === (("id", 4L, 0L, 4L, Some(1.0), Some(4.0), None, None)))
    assert(out(1) === (("score", 4L, 1L, 3L, Some(-1.0), Some(7.25), None, None)))
    assert(out(2) === (("tag", 4L, 1L, 2L, None, None, Some("a"), Some("b"))))
  }

  test("profile restricts to named columns and rejects unknown ones") {
    val df = Seq((1L, "x")).toDF("id", "tag")
    assert(Profile.profile(df, Seq("tag")).collect().map(_.getString(0)).toSeq
      === Seq("tag"))
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
  }

  test("profile handles dotted and backticked column names") {
    // flattened-JSON ingests commonly carry literal dots; a dotted name
    // folded into an internal alias would make the unpivot's col()
    // parse it as struct-field access and fail resolution (aliases are
    // positional and user refs backtick-quoted for exactly this)
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(5.0)))
      .toDF("user.id", "a`b.c")
    val out = Profile.profile(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5))))
    assert(out(0) === (("a`b.c", 3L, 1L, 2L, Some(2.0), Some(5.0))))
    assert(out(1) === (("user.id", 3L, 0L, 3L, Some(1.0), Some(3.0))))
  }

  test("histogram: fixed-width buckets match the model; clamp/null/guard rules") {
    // values straddling bucket edges, out-of-range both sides, nulls,
    // and v == hi (top-edge inclusive)
    val vals: Seq[Option[Double]] = Seq(Some(-5.0), Some(0.0), Some(9.99),
      Some(10.0), Some(15.0), Some(29.9), Some(30.0), Some(42.0), None)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Profile.histogram(df, "v", buckets = 3, lo = 0.0, hi = 30.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // model: width 10; -5 clamps to bucket 0; 30.0/42.0 clamp to bucket 2
    assert(got.toSeq === Seq(
      (0L, 0.0, 10.0, 3L),   // -5.0, 0.0, 9.99
      (1L, 10.0, 20.0, 2L),  // 10.0, 15.0
      (2L, 20.0, 30.0, 3L))) // 29.9, 30.0, 42.0 — null excluded
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "v", buckets = 0, lo = 0.0, hi = 1.0)
    }
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "v", buckets = 3, lo = 1.0, hi = 1.0)
    }
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "nope", buckets = 3, lo = 0.0, hi = 1.0)
    }
    intercept[IllegalArgumentException] { // non-numeric column
      Profile.histogram(df.withColumn("s", lit("x")), "s", 3, 0.0, 1.0)
    }
  }

  test("approx profile drops the Expand and stays within 10% on distincts") {
    val df = spark.range(5000).select(col("id"), (col("id") % 97).as("bucket"))
    // two DISTINCT columns force the Expand (one distinct column alone is
    // planned as a group-by and never expands)
    val exactPlan = Profile.profile(df, Seq("id", "bucket"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      s"exact multi-column distinct should plan through Expand:\n$exactPlan")
    val approxDf = Profile.profile(df, Seq("id", "bucket"), approx = true)
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must not pay the Expand")
    val approx = approxDf.filter(col("col_name") === "bucket").head().getLong(3)
    assert(math.abs(approx - 97L) <= 10, s"approx distinct $approx vs 97")
  }

  test("approx profile tracks the exact gate values on the sf0.01 fixture") {
    // the 100 TB face, held against the SAME fixture the q_profile gate
    // runs on: every non-distinct statistic must be IDENTICAL to the
    // exact profile (approx only swaps the distinct aggregate), and
    // each approx n_distinct must sit within 10% of the exact value
    // (HLL++ at the default 5% rsd is deterministic for fixed data, so
    // this bound is reproducible, not flaky) — with the Expand-free
    // plan that is the point of the face.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val approxDf = Profile.profile(docs, approx = true)
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must stay Expand-free on the real fixture")
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
        .toMap
    val exact = byCol(Profile.profile(docs))
    val approx = byCol(approxDf)
    assert(exact.keySet === approx.keySet)
    assert(exact.nonEmpty)
    exact.foreach { case (c, (rows, nulls, nd, mn, mx, mns, mxs)) =>
      val (arows, anulls, and, amn, amx, amns, amxs) = approx(c)
      assert((arows, anulls, amn, amx, amns, amxs) ===
        ((rows, nulls, mn, mx, mns, mxs)),
        s"$c: approx must only touch the distinct aggregate")
      assert(math.abs(and - nd) <= math.max(1L, (0.10 * nd).toLong),
        s"$c: approx n_distinct $and strays past 10% of exact $nd")
    }
  }
}
