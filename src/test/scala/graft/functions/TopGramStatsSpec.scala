package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins TopGramStats semantics (non-distinct position counts, binary
  * tie-break, WordShingles-contract short-list collapse and null-element
  * skipping) — by hand cases AND by model parity against an
  * explode/groupBy reformulation over the real documents fixture — plus
  * the repetitionStats plan property that makes it the 100 TB shape:
  * the whole computation is a narrow map, zero Exchange. */
class TopGramStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def statsOf(tokens: Seq[String], n: Int) = {
    val df = Seq(Tuple1(tokens)).toDF("tk")
      .select(TopGramStats.stats(col("tk"), n).as("st"))
      .select("st.top_count", "st.top_gram", "st.n_positions", "st.dup_positions")
    df.collect().head
  }

  test("counts are per-position (non-distinct); ties break binary-ascending") {
    val r = statsOf(Seq("b", "a", "b", "a"), 2)
    // grams: "b a", "a b", "b a" → top ("b a", 2); positions 3; dup 2
    assert((r.getInt(0), r.getString(1), r.getInt(2), r.getInt(3)) ===
      ((2, "b a", 3, 2)))
    val tie = statsOf(Seq("z", "y", "a", "b"), 2)
    // "z y", "y a", "a b" all count 1 → tie → binary-smallest "a b"
    assert((tie.getInt(0), tie.getString(1)) === ((1, "a b")))
  }

  test("short token lists collapse to one whole-list gram (WordShingles contract)") {
    val r = statsOf(Seq("only"), 3)
    assert((r.getInt(0), r.getString(1), r.getInt(2), r.getInt(3)) ===
      ((1, "only", 1, 0)))
  }

  test("null elements are skipped concat_ws-style; empty array is zeros") {
    val r = statsOf(Seq("a", null, "b"), 2)
    // windows: [a,null]→"a", [null,b]→"b" — same joining rule as WordShingles
    assert(r.getInt(2) === 2 && r.getInt(3) === 0)
    val empty = statsOf(Seq.empty[String], 2)
    assert((empty.getInt(0), empty.getString(1), empty.getInt(2)) === ((0, "", 0)))
  }

  test("null token array → null struct") {
    val df = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("tk")
      .select(TopGramStats.stats(col("tk"), 2).as("st"))
    assert(df.collect().head.isNullAt(0))
  }

  test("model parity on the real fixture: explode/groupBy agrees") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val toks = docs.select(col("doc_id"),
      split(graft.scale.Dedup.exactKey(col("text")), " ").as("tk"))
    val fast = toks
      .select(col("doc_id"), TopGramStats.stats(col("tk"), 2).as("st"))
      .select(col("doc_id"), col("st.top_count"), col("st.top_gram"),
        col("st.n_positions"), col("st.dup_positions"))
    // model: gram positions via the HOF tower, exploded and re-aggregated
    val pos = toks.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), greatest(size(col("tk")) - 2, lit(0))),
        i => concat_ws(" ", slice(col("tk"), i + 1, lit(2))))))
      .select(col("doc_id"), col("col").as("g"))
    val counts = pos.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    // top gram via a (c desc, g asc) window — the tie-break under test
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("c").desc, col("g").asc)
    val modelTop = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(counts.groupBy("doc_id").agg(
        sum("c").as("n_positions"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0)).as("dup_positions")),
        "doc_id")
      .select(col("doc_id"), col("c").cast("int").as("top_count"),
        col("g").as("top_gram"), col("n_positions").cast("int"),
        col("dup_positions").cast("int"))
    val a = fast.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getInt(3), r.getInt(4))).sortBy(_._1)
    val b = modelTop.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getInt(3), r.getInt(4))).sortBy(_._1)
    assert(a.length === 500 && a.toSeq === b.toSeq)
  }

  test("repetitionStats is a narrow map: zero Exchange in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val plan = graft.scale.TextAnalysis.repetitionStats(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetition signals must not shuffle:\n$plan")
  }

  test("repetitionStats refuses a user __rep column instead of silently dropping it") {
    val df = Seq((1L, "a a a", "keep me")).toDF("doc_id", "text", "__rep")
    val e = intercept[IllegalArgumentException] {
      graft.scale.TextAnalysis.repetitionStats(df, "text")
    }
    assert(e.getMessage.contains("__rep"))
  }

  test("dupLineFraction: duplicates, blanks dropped, empty text") {
    val df = Seq(
      (1, "a\nb\na\n\n  \nb"),  // lines a,b,a,b → 4 total, 2 distinct
      (2, "x\ny"),
      (3, "")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        graft.scale.TextAnalysis.dupLineFraction(col("text")).as("f"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(out(0) === ((1, 0.5)) && out(1) === ((2, 0.0)) && out(2) === ((3, 0.0)))
  }
}
