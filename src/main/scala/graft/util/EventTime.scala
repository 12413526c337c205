package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Event-time column normalization to a single canonical type:
 * `TimestampType` (instant, rendered in the session time zone — all graft
 * entry points pin `spark.sql.session.timeZone=UTC`).
 *
 * The driver's testdata contract for `events.ts` has already changed once
 * (rounds ≤11: parquet TIMESTAMP(NANOS) surfaced as INT64 nanos under
 * `spark.sql.legacy.parquet.nanosAsLong`; round 12+: native
 * TIMESTAMP(MICROS, isAdjustedToUTC=false) surfaced as TimestampNTZ), so
 * ingestion tolerates every representation it could plausibly become next:
 *
 *  - `LongType`           → epoch **nanos** → `timestamp_micros(v div 1000)`.
 *    Integer division: a double division would promote ~1.7e18 past 2^53
 *    and lose ±1 µs.
 *  - `TimestampNTZType`   → reinterpreted as a UTC wall clock via
 *    `to_utc_timestamp(cast ntz, session tz)`-free path: under a UTC
 *    session, `cast(ntz as timestamp)` keeps the micros bit-identical,
 *    and that is the only session tz graft runs with.
 *  - `TimestampType`      → already canonical, untouched.
 *  - `DateType`           → midnight UTC of that day.
 *  - `StringType`         → `cast(ts as timestamp)` (ISO-8601, session tz).
 *
 * Parquet's µs/ms units both land on TimestampNTZ/Timestamp after the scan
 * (Spark converts units during decode), so no unit branch is needed beyond
 * the legacy nanos-as-long case.
 */
object EventTime {

  /** Resolve `colName` like Spark's default analyzer: an EXACT-case
    * match wins outright (also correct under spark.sql.caseSensitive);
    * otherwise a unique case-variant matches — a column cased 'TS' must
    * normalize, not silently skip and still resolve later. Two
    * case-variants with no exact match are loud; Spark itself would
    * throw on reference under its default resolver. */
  private def resolve(schema: StructType, colName: String): Option[StructField] =
    schema.fields.find(_.name == colName).orElse {
      schema.fields.filter(_.name.equalsIgnoreCase(colName)) match {
        case Array()  => None
        case Array(f) => Some(f)
        case many => throw new IllegalArgumentException(
          s"EventTime: column '$colName' is ambiguous under Spark's " +
            s"case-insensitive resolution: ${many.map(_.name).mkString(", ")}")
      }
    }

  /** Normalizing projection for an already-resolved field; None when the
    * column is already canonical (no projection needed). */
  // backtick-quoted reference: a time column named with a literal dot
  // (flattened-JSON ingests) would otherwise parse as struct access
  private def qcol(f: StructField): Column =
    col(s"`${f.name.replace("`", "``")}`")

  private def exprFor(f: StructField): Option[Column] =
    f.dataType match {
      case TimestampType    => None
      case LongType         => Some(timestamp_micros(expr(s"`${f.name.replace("`", "``")}` div 1000")))
      case TimestampNTZType => Some(qcol(f).cast(TimestampType))
      case DateType         => Some(qcol(f).cast(TimestampType))
      case StringType       => Some(qcol(f).cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"EventTime: column '${f.name}' has unsupported type $other " +
            "(expected INT64 epoch-nanos, timestamp, timestamp_ntz, date, or string)")
    }

  /** Normalizing projection for one column of `schema` (resolved
    * case-insensitively); None when the column is absent or already
    * canonical (no projection needed). */
  def normalizeExpr(schema: StructType, colName: String): Option[Column] =
    resolve(schema, colName).flatMap(exprFor)

  /** `df` with `colName` (if present) normalized to `TimestampType`.
    * Replaces the column under its ACTUAL schema casing. */
  def normalize(df: DataFrame, colName: String): DataFrame =
    resolve(df.schema, colName).map { f =>
      exprFor(f) match {
        case Some(e) => df.withColumn(f.name, e)
        case None    => df
      }
    }.getOrElse(df)

  /** Component-facing event-time normalization, shared by the batch
    * `aggregation` time-window path and the streaming components so a
    * config means the SAME thing in both modes. String/date/NTZ/native
    * timestamps normalize like [[normalizeExpr]]; an INT64 column
    * additionally REQUIRES an explicit `time_unit`
    * (seconds|millis|micros|nanos) — an epoch long's scale is not
    * inferable, and guessing yields garbage windows that run green. */
  def forComponent(schema: StructType, colName: String,
                   unit: Option[String], what: String): Column = {
    val f = resolve(schema, colName).getOrElse(throw new IllegalArgumentException(
      s"$what: time_column '$colName' not in input columns " +
        schema.fieldNames.mkString(", ")))
    f.dataType match {
      case LongType =>
        val u = unit.getOrElse(throw new IllegalArgumentException(
          s"$what: time_column '${f.name}' is an INT64 epoch — declare " +
            "'time_unit' (seconds|millis|micros|nanos) so the scale is explicit"))
        val quoted = s"`${f.name.replace("`", "``")}`"
        u match {
          case "seconds" => timestamp_seconds(qcol(f))
          case "millis"  => timestamp_millis(qcol(f))
          case "micros"  => timestamp_micros(qcol(f))
          case "nanos"   => timestamp_micros(expr(s"$quoted div 1000"))
          case other => throw new IllegalArgumentException(
            s"$what: unknown time_unit '$other' (seconds|millis|micros|nanos)")
        }
      case _ => exprFor(f).getOrElse(qcol(f))
    }
  }
}
