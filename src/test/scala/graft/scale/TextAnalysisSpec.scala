package graft.scale

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit edges for the text operators whose broad behavior the gate
  * queries cover — here, PII redaction corner cases the seeded gate
  * can't reach (format variants, multiplicity, non-matches). */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def redact(s: String): (String, Long, Long, Long) = {
    val row = TextAnalysis.redactPiiWithCounts(Seq(Tuple1(s)).toDF("text")).head()
    (row.getAs[String]("text"), row.getAs[Long]("n_emails"),
      row.getAs[Long]("n_phones"), row.getAs[Long]("n_ips"))
  }

  test("dupLineFraction kernel equals the HOF reference (fixture + edges)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(concat_ws("\n", col("text"), col("text"), lit("x")).as("t"))
    val bad = docs.select(
      TextAnalysis.dupLineFraction(col("t")).as("a"),
      TextAnalysis.dupLineFractionHof(col("t")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(bad === 0L, s"$bad rows diverge on the seeded-duplicate fixture")
    val edges = Seq("", "   ", "\n\n\n", "a\na\na", " a \na\n b ",
      "only one line", "a\n\na\n  \na", null)
      .zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val ebad = edges.select(
      TextAnalysis.dupLineFraction(col("t")).as("a"),
      TextAnalysis.dupLineFractionHof(col("t")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(ebad === 0L, "blank/null/whitespace edges diverge")
  }

  test("tokenCount/meanWordLen kernel equals the split forms (fixture + edges)") {
    // the real corpus plus every split() quirk the kernel must keep:
    // Spark split keeps leading AND trailing empty fields, so a
    // leading tab / trailing newline contributes a phantom empty
    // token; lone "\t" is TWO phantom tokens; chars count CODE POINTS
    // (astral emoji = 1); trim strips 0x20 only
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text").as("t"))
    val edges = Seq("", " ", "\t", "\ta", "a\n", " a b ", "a  b\t\nc",
      "😀 ok", "日本語 テスト", "𝐀b c", null)
      .zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    for (df <- Seq(real, edges.select(col("t")))) {
      val bad = df.select(
        TextAnalysis.tokenCount(col("t")).as("ka"),
        TextAnalysis.tokenCountSplit(col("t")).as("sa"),
        TextAnalysis.meanWordLen(col("t")).as("kb"),
        TextAnalysis.meanWordLenSplit(col("t")).as("sb"))
        .filter(not(col("ka") <=> col("sa")) || not(col("kb") <=> col("sb")))
        .count()
      assert(bad === 0L, "kernel and split token stats must agree")
    }
    // the quirks themselves, pinned so a future 'fix' is deliberate
    val got = edges.select(col("i"), TextAnalysis.tokenCount(col("t")).as("n"))
      .as[(Int, Option[Long])].collect().toMap
    assert(got(0) === Some(0L) && got(1) === Some(0L), "blank → 0")
    assert(got(2) === Some(2L), "lone tab → two phantom empty tokens")
    assert(got(3) === Some(2L), "leading tab → phantom + real")
    assert(got(4) === Some(2L), "trailing newline → real + phantom")
    assert(got(10) === None, "null propagates")
    // astral char is ONE char for mean length: "𝐀b c" = 3 chars / 2 toks
    val ml = edges.filter(col("i") === 9)
      .select(TextAnalysis.meanWordLen(col("t"))).as[Double].head()
    assert(ml === 1.5)
    // stays inside whole-stage codegen
    val rq = spark.range(3).select(TextAnalysis.tokenCount(
      concat(lit("a b "), col("id").cast("string"))).as("n"))
    assert(rq.queryExecution.executedPlan.toString.contains("*(1)"),
      s"expected codegen:\n${rq.queryExecution.executedPlan}")
    assert(rq.as[Long].collect().forall(_ === 3L))
  }

  test("stopword kernels equal the split forms: occurrences and distinct hits") {
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text").as("t"))
    val edges = Seq("", " ", "\t", "THE the The tHe be", "the", "be be be",
      "no stop words here at all", "\tthe\n", "the  be\tto", null)
      .zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val low = split(lower(trim(col("t"))), "\\s+")
    val oldDistinct = TextAnalysis.GopherStopwords.map(w =>
      array_contains(low, w).cast("int")).reduce(_ + _)
    for (df <- Seq(real, edges.select(col("t")))) {
      val bad = df.select(
        TextAnalysis.stopwordRatio(col("t")).as("kr"),
        TextAnalysis.stopwordRatioSplit(col("t")).as("sr"),
        graft.functions.CountTokensInSet.countDistinct(
          col("t"), TextAnalysis.GopherStopwords).as("kd"),
        oldDistinct.as("sd"))
        .filter(not(col("kr") <=> col("sr")) || not(col("kd") <=> col("sd")))
        .count()
      assert(bad === 0L, "kernel and split stopword counts must agree")
    }
    // the distinct/occurrence distinction itself, pinned
    val x = Seq(("THE the The tHe be")).toDF("t").select(
      graft.functions.CountTokensInSet.count(
        col("t"), TextAnalysis.GopherStopwords).as("occ"),
      graft.functions.CountTokensInSet.countDistinct(
        col("t"), TextAnalysis.GopherStopwords).as("dis")).head()
    assert(x.getInt(0) === 5, "case-folded occurrences: 4x the + 1x be")
    assert(x.getInt(1) === 2, "distinct members: the, be")
  }

  test("pii: email variants and multiplicity") {
    assert(redact("mail a.b+tag@sub.example.co.uk now") ===
      (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(redact("x@y.io and z@w.org") === (("<EMAIL> and <EMAIL>", 2L, 0L, 0L)))
  }

  test("pii: phone formats — separators required, bare digits left alone") {
    assert(redact("call 555-123-4567")._1 === "call <PHONE>")
    assert(redact("call 555.123.4567")._1 === "call <PHONE>")
    assert(redact("call (555) 123-4567")._1 === "call <PHONE>")
    // conservative by design: 10 bare digits are NOT masked
    assert(redact("id 5551234567") === (("id 5551234567", 0L, 0L, 0L)))
  }

  test("pii: digit-boundary guard — a longer digit run is not a phone") {
    // before the (^|[^0-9]) guard this masked the 3-3-4 suffix: "1<PHONE>"
    assert(redact("ref 1555-123-4567 x") === (("ref 1555-123-4567 x", 0L, 0L, 0L)))
    // guard at string start and the restored boundary char
    assert(redact("555-123-4567")._1 === "<PHONE>")
    assert(redact("a:555-123-4567")._1 === "a:<PHONE>")
    // back-to-back phones with a single separator both mask (no
    // trailing guard to swallow the space — the documented tradeoff)
    assert(redact("555-123-4567 555.123.4567") === (("<PHONE> <PHONE>", 0L, 2L, 0L)))
  }

  test("pii: ipv4 masked, version-like dotted numbers need 4 octets") {
    assert(redact("host 192.168.0.1 up") === (("host <IP> up", 0L, 0L, 1L)))
    assert(redact("spark 4.1.2 release")._4 === 0L, "three octets must not match")
  }

  test("pii: email masked before its digits can look like a phone") {
    // the local part contains a phone-shaped run; the email replacement
    // consumes it first, so no <PHONE> appears in the masked text
    val (masked, ne, np, _) = redact("reach 555-123-4567@corp.com today")
    assert(masked === "reach <EMAIL> today")
    assert(ne === 1L)
    // counts are raw-text occurrences, documented as order-independent
    assert(np === 1L)
  }

  test("pii: clean text passes through untouched") {
    assert(redact("no pii here just words") === (("no pii here just words", 0L, 0L, 0L)))
  }

  test("fingerprint: null text is NULL; empty and null never collide") {
    // null → null (like every analysis column and the DuckDB oracle's
    // md5(NULL)); empty/blank → md5("") via the rawkey fallback; CJK
    // (no ascii tokens) → rawkey fallback, distinct per text; bag-of-
    // words equality collides by design
    val rows = Seq((1L, null), (2L, ""), (3L, "   "), (4L, "你好 世界"),
      (5L, "世界 你好 世界"), (6L, "b a a"), (7L, "A  b."))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("fp")).toMap
    assert(rows(1L) == null, "null text must fingerprint to NULL")
    assert(rows(2L) != null && rows(2L) === rows(3L),
      "empty and blank share md5 of the empty normalized key")
    assert(rows(4L) != null && rows(5L) != null && rows(4L) != rows(5L),
      "CJK fallback distinguishes different raw texts")
    assert(rows(4L) != rows(2L), "CJK fallback must not collapse onto empty")
    assert(rows(6L) === rows(7L), "same token bag collides by design")
  }
}
