package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.scale.Dedup

/** WordShingles and CharShingles must match their HOF forms exactly —
  * minhash signatures, jaccard posting lists and verification all hang
  * off these arrays (values AND first-occurrence distinct order). */
class WordShinglesSpec extends SparkTestBase {

  test("word shingles match the HOF form over the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for (n <- Seq(1, 3, 4)) {
      val bad = docs.select(
        Dedup.wordShingles(col("text"), n).as("a"),
        Dedup.wordShinglesHof(col("text"), n).as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(bad === 0L, s"n=$n: $bad documents diverge")
    }
  }

  test("char shingles match the HOF form over the documents fixture (CJK)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for (n <- Seq(2, 5)) {
      val bad = docs.select(
        Dedup.shingles(col("text"), n).as("a"),
        Dedup.shinglesHof(col("text"), n).as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(bad === 0L, s"n=$n: $bad documents diverge")
    }
  }

  test("edge cases: null, empty, blank, short, dups") {
    import spark.implicits._
    val df = Seq((1, "one two three four"), (2, "one"), (3, ""), (4, "   "),
      (5, null.asInstanceOf[String]), (6, "a a a a")).toDF("id", "text")
    val got = df.select(col("id"),
      Dedup.wordShingles(col("text"), 3).as("wa"),
      Dedup.wordShinglesHof(col("text"), 3).as("wb"),
      Dedup.shingles(col("text"), 5).as("ca"),
      Dedup.shinglesHof(col("text"), 5).as("cb")).orderBy(col("id")).collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"row ${r.getInt(0)} word nullness")
      assert(r.isNullAt(3) === r.isNullAt(4), s"row ${r.getInt(0)} char nullness")
      if (!r.isNullAt(1)) assert(r.getSeq[String](1) === r.getSeq[String](2), s"row ${r.getInt(0)} word")
      if (!r.isNullAt(3)) assert(r.getSeq[String](3) === r.getSeq[String](4), s"row ${r.getInt(0)} char")
    }
    assert(got(0).getSeq[String](1) === Seq("one two three", "two three four"))
    assert(got(1).getSeq[String](1) === Seq("one"))   // short → whole-text
    assert(got(2).getSeq[String](1) === Seq(""))      // empty text → [""]
    assert(got(4).isNullAt(1))                        // null → null (word)
    assert(got(4).getSeq[String](3) === Seq(null))    // null → [null] (char)
    assert(got(5).getSeq[String](1) === Seq("a a a")) // dups collapse
  }

  test("shinglesAll: positional grams with duplicates, short-list/empty/null rules") {
    import spark.implicits._
    val df = Seq(
      (1, Seq("a", "b", "a", "b")),
      (2, Seq("x")),                 // short → whole-list collapse
      (3, Seq.empty[String]),
      (4, null.asInstanceOf[Seq[String]]),
      (5, Seq("a", null, "b"))).toDF("id", "toks")
    val got = df.select(col("id"),
      WordShingles.shinglesAll(col("toks"), 2).as("g")).orderBy("id").collect()
    assert(got(0).getSeq[String](1) === Seq("a b", "b a", "a b"),
      "every position, duplicates kept in order")
    assert(got(1).getSeq[String](1) === Seq("x"))
    assert(got(2).getSeq[String](1) === Seq.empty)
    assert(got(3).isNullAt(1))
    assert(got(4).getSeq[String](1) === Seq("a", "b"),
      "null window elements skip concat_ws-style")
    // distinct mode = positional mode deduped with first-occurrence order
    val both = df.filter(col("toks").isNotNull).select(
      WordShingles.shinglesAll(col("toks"), 2).as("all"),
      WordShingles.shingles(col("toks"), 2).as("dst")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](0).distinct === r.getSeq[String](1)) }
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(3).select(
      concat(lit("alpha beta gamma delta "), col("id").cast("string")).as("text"))
    val q = df.select(Dedup.wordShingles(col("text"), 2).as("w"),
      Dedup.shingles(col("text"), 4).as("c"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1)"),
      s"expected codegen:\n${q.queryExecution.executedPlan}")
    assert(q.collect().length === 3)
  }
}
