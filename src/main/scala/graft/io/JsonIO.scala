package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * JSON source/sink with the reference engine's semantics (reference:
 * src/etl_core/receivers/files/json/json_helper.py:65-151,
 * json_receiver.py:71-317):
 *
 *  - NDJSON by extension `.jsonl`/`.ndjson` (optionally `.gz`; gzip is
 *    transparent — Spark's text/json readers decompress by codec);
 *  - JSON array / single-object files read with multiLine=true;
 *  - LENIENT NDJSON mode skips malformed lines instead of failing
 *    (json_helper.py:79-98) — implemented as a text read + from_json, so
 *    bad lines become nulls that are filtered and counted, all
 *    distributed, nothing driver-side;
 *  - non-dict JSON values are wrapped as {"_value": v}
 *    (json_helper.py:149-151) when the target schema declares `_value`;
 *  - NaN/Infinity are sanitized to null on write (json_helper.py:40-62);
 *  - output is NDJSON part files per partition (json_receiver.py:288-317),
 *    Spark's native layout.
 */
object JsonIO {

  def isNdjsonPath(path: String): Boolean = {
    val p = path.toLowerCase
    p.endsWith(".jsonl") || p.endsWith(".ndjson") ||
      p.endsWith(".jsonl.gz") || p.endsWith(".ndjson.gz")
  }

  /** Strict read: NDJSON or array/object files (by `multiLine`). */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None,
           multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("multiLine", multiLine.toString)
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /**
   * Lenient NDJSON read: malformed lines are dropped (not failed), and a
   * `_malformed` metric column can be observed by the caller via the
   * returned count. Scalar/array lines are wrapped into {"_value": v} when
   * `schema` declares a `_value` field, by re-parsing the raw line inside
   * a synthetic object — pure expressions, fully distributed.
   */
  def readNdjsonLenient(spark: SparkSession, path: String,
                        schema: StructType): DataFrame = {
    val lines = rawLines(spark, path)
    val (parsed, ok) = parseLine(schema)
    val rec = schema.fields.find(_.name == "_value") match {
      case Some(f) =>
        // {"_value": <line>} is a valid JSON object whenever the line is a
        // valid scalar/array — the reference's non-dict wrapping
        val (wrapped, wrapOk) = parseWrapped(f)
        when(ok, parsed).otherwise(
          when(wrapOk, struct(schema.fields.toSeq.map { sf =>
            (if (sf.name == "_value") wrapped.getField("_value")
             else lit(null).cast(sf.dataType)).as(sf.name)
          }: _*)))
      case None => when(ok, parsed)
    }
    lines.select(rec.as("rec")).filter(col("rec").isNotNull).select(col("rec.*"))
  }

  private val Corrupt = "_graft_corrupt"

  /** from_json in PERMISSIVE mode yields an all-null row (not null) for a
    * malformed line, so parse success is detected via a corrupt-record
    * column: null corrupt field ⇔ the line parsed. */
  private def parseLine(schema: StructType): (Column, Column) = {
    val ps = StructType(schema.fields :+ StructField(Corrupt, StringType))
    val parsed = from_json(col("line"), ps, Map("columnNameOfCorruptRecord" -> Corrupt))
    (parsed.dropFields(Corrupt), parsed.getField(Corrupt).isNull)
  }

  private def parseWrapped(f: StructField): (Column, Column) = {
    val ps = StructType(Seq(f, StructField(Corrupt, StringType)))
    val parsed = from_json(concat(lit("{\"_value\":"), col("line"), lit("}")),
      ps, Map("columnNameOfCorruptRecord" -> Corrupt))
    (parsed.dropFields(Corrupt), parsed.getField(Corrupt).isNull)
  }

  private def rawLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("line"))
      .filter(length(col("line")) > 0)

  /** Count of malformed (unparseable, unwrappable) NDJSON lines — the
    * reference's lenient-skip error metric (json_helper.py:90-96). */
  def countMalformed(spark: SparkSession, path: String, schema: StructType): Long = {
    val (_, ok) = parseLine(schema)
    val wrappable = schema.fields.find(_.name == "_value") match {
      case Some(f) => parseWrapped(f)._2
      case None => lit(false)
    }
    rawLines(spark, path).filter(!ok && !wrappable).count()
  }

  /** NaN/±Inf → null in all double/float columns (incl. nested), matching
    * the reference's write-side sanitizer. */
  def sanitizeFloats(df: DataFrame): DataFrame = {
    def fix(c: Column, dt: DataType): Column = dt match {
      case DoubleType | FloatType => when(isnan(c) || abs(c) === Double.PositiveInfinity,
        lit(null).cast(dt)).otherwise(c)
      case st: StructType =>
        struct(st.fields.toSeq.map(f => fix(c.getField(f.name), f.dataType).as(f.name)): _*)
      case at: ArrayType => transform(c, x => fix(x, at.elementType))
      case _ => c
    }
    df.select(df.schema.fields.toSeq.map(f =>
      fix(col(s"`${f.name}`"), f.dataType).as(f.name)): _*)
  }

  /** NDJSON write (Spark-native part files); optional gzip. */
  def write(df: DataFrame, path: String, gzip: Boolean = false,
            singleFile: Boolean = false): Unit = {
    val clean = sanitizeFloats(df)
    val out = if (singleFile) clean.coalesce(1) else clean
    val w = out.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }
}
