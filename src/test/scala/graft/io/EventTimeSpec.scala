package graft.io

import graft.SparkTestBase
import graft.util.EventTime
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The driver's events.ts contract has changed once already (INT64-nanos →
  * native TIMESTAMP(µs) NTZ); EventTime must map every plausible
  * representation to the same canonical TimestampType micros. */
class EventTimeSpec extends SparkTestBase {

  // 2024-03-05T17:30:01.123456 UTC, in micros
  private val micros = 1709659801123456L

  private def microsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val out = EventTime.normalize(df, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
  }

  test("INT64 epoch-nanos normalizes without double-precision loss") {
    import spark.implicits._
    // ~1.7e18 > 2^53: a double division would round; `div` must not
    val df = Seq(micros * 1000L, micros * 1000L + 999L).toDF("ts")
    assert(microsOf(df) == Seq(micros, micros))
  }

  test("TimestampNTZ (current parquet contract) keeps micros under UTC session") {
    val dir = Files.createTempDirectory("evt-ntz").toFile
    dir.deleteOnExit()
    val p = new java.io.File(dir, "events.parquet").getAbsolutePath
    val ntz = spark.createDataFrame(
      java.util.List.of(Row(java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, ((micros % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    ntz.write.mode("overwrite").parquet(p)
    // re-read with NTZ inference on (Spark 4 default) — the driver-data shape
    val back = spark.read.parquet(p)
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(microsOf(back) == Seq(micros))
  }

  test("TimestampType (LTZ) passes through unchanged — no projection added") {
    val ltz = spark.createDataFrame(
      java.util.List.of(Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(micros / 1000000L, (micros % 1000000L) * 1000L)))),
      StructType(Seq(StructField("ts", TimestampType))))
    assert(EventTime.normalizeExpr(ltz.schema, "ts").isEmpty)
    assert(microsOf(ltz) == Seq(micros))
  }

  test("forComponent: INT64 requires explicit time_unit, all four scales agree") {
    import spark.implicits._
    def viaUnit(v: Long, unit: String): Long = {
      val df = Seq(v).toDF("ts")
      df.select(unix_micros(EventTime.forComponent(df.schema, "ts",
        Some(unit), "test"))).collect().head.getLong(0)
    }
    assert(viaUnit(micros / 1000000L, "seconds") === micros / 1000000L * 1000000L)
    assert(viaUnit(micros / 1000L, "millis") === micros / 1000L * 1000L)
    assert(viaUnit(micros, "micros") === micros)
    assert(viaUnit(micros * 1000L, "nanos") === micros)
    val longDf = Seq(1L).toDF("ts")
    val e1 = intercept[IllegalArgumentException] {
      EventTime.forComponent(longDf.schema, "ts", None, "test")
    }
    assert(e1.getMessage.contains("time_unit"))
    val e2 = intercept[IllegalArgumentException] {
      EventTime.forComponent(longDf.schema, "ts", Some("days"), "test")
    }
    assert(e2.getMessage.contains("unknown time_unit"))
    val e3 = intercept[IllegalArgumentException] {
      EventTime.forComponent(longDf.schema, "nope", None, "test")
    }
    assert(e3.getMessage.contains("not in input columns"))
    // non-INT64 columns ignore time_unit and normalize as usual
    val sDf = Seq("2024-03-05T17:30:01.123456").toDF("ts")
    assert(sDf.select(unix_micros(EventTime.forComponent(sDf.schema, "ts",
      Some("nanos"), "test"))).collect().head.getLong(0) === micros)
  }

  test("column resolution is case-insensitive, like Spark's analyzer") {
    import spark.implicits._
    // a column cased 'TS' must still normalize (not silently skip while
    // resolving downstream), and keep its schema casing
    val df = Seq(micros * 1000L).toDF("TS")
    val out = EventTime.normalize(df, "ts")
    assert(out.columns.toSeq == Seq("TS"))
    assert(out.schema("TS").dataType == TimestampType)
    assert(out.select(unix_micros(col("TS"))).collect().head.getLong(0) == micros)
    // forComponent resolves the same way
    assert(df.select(unix_micros(EventTime.forComponent(df.schema, "ts",
      Some("nanos"), "test"))).collect().head.getLong(0) == micros)
    // an exact-case match wins outright (also correct under
    // spark.sql.caseSensitive); ambiguity is loud only when no exact
    // match disambiguates the case-variants
    val dup = StructType(Seq(StructField("ts", LongType), StructField("TS", LongType)))
    assert(EventTime.normalizeExpr(dup, "ts").isDefined)
    val e = intercept[IllegalArgumentException] {
      EventTime.normalizeExpr(dup, "Ts")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("ISO string and date variants cast; absent column is a no-op; bad type throws") {
    import spark.implicits._
    assert(microsOf(Seq("2024-03-05T17:30:01.123456").toDF("ts")) == Seq(micros))
    val d = Seq(java.sql.Date.valueOf("2024-03-05")).toDF("ts")
    assert(microsOf(d) == Seq(1709596800000000L)) // midnight UTC
    val noTs = Seq(1).toDF("x")
    assert(EventTime.normalize(noTs, "ts") eq noTs)
    intercept[IllegalArgumentException] {
      EventTime.normalize(Seq(1.5).toDF("ts"), "ts")
    }
  }
}
