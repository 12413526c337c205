package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins hashShuffle's contract: deterministic total order independent of
  * input partitioning, the one-range-exchange plan, the null-id fixed
  * key, and the loud key-collision failure. */
class ShufflePlanSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(parts: Int) = spark.range(500)
    .select(col("id"), concat(lit("t"), col("id") % 7).as("tag"))
    .repartition(parts)

  test("total order is deterministic across input partitionings and runs") {
    val a = RelationalOps.hashShuffle(docs(3), "id", seed = "s1")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val b = RelationalOps.hashShuffle(docs(17), "id", seed = "s1")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(a.toSeq === b.toSeq, "same seed must give the same global order")
    // the collected order IS the key order (range partitions concatenate
    // in key order; collect preserves partition order)
    assert(a.map(_._2).toSeq === a.map(_._2).sorted.toSeq)
  }

  test("different seeds draw different permutations over the same rows") {
    val a = RelationalOps.hashShuffle(docs(4), "id", seed = "s1")
      .collect().map(_.getLong(0))
    val b = RelationalOps.hashShuffle(docs(4), "id", seed = "s2")
      .collect().map(_.getLong(0))
    assert(a.sorted.toSeq === b.sorted.toSeq, "same rows either way")
    assert(a.toSeq !== b.toSeq, "500 rows permuting identically is ~0")
  }

  test("plan: ONE range exchange, no global Sort node") {
    // un-repartitioned input: the fixture's explicit round-robin would
    // rightly show as its own Exchange and isn't the op's cost
    val in = spark.range(500)
      .select(col("id"), concat(lit("t"), col("id") % 7).as("tag"))
    val plan = RelationalOps.hashShuffle(in, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"), s"range exchange:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"exactly one exchange:\n$plan")
    // sortWithinPartitions compiles to Sort(global=false); a global sort
    // would re-shuffle
    assert(!plan.contains("Sort [shuffle_key") || !plan.contains("global=true"),
      s"no global sort:\n$plan")
  }

  test("null ids take the fixed md5(seed:) key and are not dropped") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("id")
    val out = RelationalOps.hashShuffle(df, "id", seed = "z")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
    assert(out.length == 3)
    val nullKey = out.find(_._1 == -1L).get._2
    // same key an empty-string id would get — the documented collision
    val emptyKey = RelationalOps.hashShuffle(Seq("").toDF("id"), "id", seed = "z")
      .collect().head.getString(1)
    assert(nullKey === emptyKey)
  }

  test("key-column collision and empty name fail loudly") {
    val df = Seq((1L, "x")).toDF("id", "shuffle_key")
    val e = intercept[IllegalArgumentException] {
      RelationalOps.hashShuffle(df, "id")
    }
    assert(e.getMessage.contains("shuffle_key"))
    intercept[IllegalArgumentException] {
      RelationalOps.hashShuffle(Seq(1L).toDF("id"), "id", keyCol = "")
    }
  }
}
