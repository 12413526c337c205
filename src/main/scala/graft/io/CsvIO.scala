package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * CSV source/sink with the reference engine's semantics (reference:
 * src/etl_core/components/file_components/csv/read_csv.py:13-50,
 * csv_component.py:8-13, receivers/files/csv/csv_helper.py:13-83):
 *
 *  - delimiter restricted to the reference's enum: `,` `;` `\t`;
 *  - header always present;
 *  - ALL columns read as string (`dtype=str`, csv_helper.py:29,39) unless
 *    an explicit schema is supplied — typing is `type_conversion`'s job;
 *  - single-file write parity (`single_file=True`, csv_helper.py:69-83)
 *    via coalesce(1); multi-part is the default at scale.
 *
 * Nested data is flattened at this boundary (Flatten codec) because CSV is
 * a flat format; inside the engine frames stay nested.
 */
object CsvIO {

  val Delimiters: Set[String] = Set(",", ";", "\t")

  private def checkSep(sep: String): Unit =
    require(Delimiters.contains(sep),
      s"delimiter must be one of ',' ';' '\\t' (got '$sep')")

  /** Read a header CSV; all columns as string unless `schema` is given. */
  def read(spark: SparkSession, path: String, sep: String = ",",
           schema: Option[StructType] = None): DataFrame = {
    checkSep(sep)
    val r = spark.read
      .option("header", "true")
      .option("sep", sep)
      // reference readers never infer types; keep every column a string
      .option("inferSchema", "false")
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  /** Write a header CSV directory; flattens nested columns first. */
  def write(df: DataFrame, path: String, sep: String = ",",
            singleFile: Boolean = false,
            arrayBound: Option[Int] = None): Unit = {
    checkSep(sep)
    val flat = Flatten.flatten(df, arrayBound)
    val out = if (singleFile) flat.coalesce(1) else flat
    out.write
      .mode("overwrite")
      .option("header", "true")
      .option("sep", sep)
      .csv(path)
  }
}
