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
}
