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

  /** Read a header CSV; all columns as string unless `schema` is given.
    *
    * `multiLine` stays false by default (line-splittable parallel parse,
    * the component contract); the append path below turns it ON for the
    * re-read of OUR OWN output, whose writer quotes embedded newlines
    * across physical lines — a line-based parse would split such a
    * record into corrupt rows. */
  def read(spark: SparkSession, path: String, sep: String = ",",
           schema: Option[StructType] = None,
           multiLine: Boolean = false): DataFrame = {
    checkSep(sep)
    val r = spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("multiLine", multiLine.toString)
      // reference readers never infer types; keep every column a string
      .option("inferSchema", "false")
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  /** Write a header CSV directory; flattens nested columns first.
    *
    * `append=true` mirrors the reference's row-append (header written only
    * once, csv_helper.py:42-52): the existing file is read back, unioned
    * with the new rows (both all-string — CSV's own type system), written
    * to a staging path, and swapped in atomically. The read happens before
    * the target is touched, so Spark's lazy evaluation can't truncate the
    * input it is still reading. */
  def write(df: DataFrame, path: String, sep: String = ",",
            singleFile: Boolean = false,
            arrayBound: Option[Int] = None,
            append: Boolean = false): Unit = {
    checkSep(sep)
    val flat = Flatten.flatten(df, arrayBound)
    val asStr = flat.select(flat.columns.toSeq.map(c =>
      org.apache.spark.sql.functions.col(s"`$c`").cast("string").as(c)): _*)
    val target =
      if (append && IOSwap.exists(path)) {
        val existing = read(df.sparkSession, path, sep, multiLine = true)
        require(existing.columns.sorted.sameElements(asStr.columns.sorted),
          s"csv append: column mismatch (${existing.columns.mkString(",")} vs ${asStr.columns.mkString(",")})")
        existing.unionByName(asStr)
      } else asStr
    val out = if (singleFile) target.coalesce(1) else target
    IOSwap.writeSwapped(path, append && IOSwap.exists(path)) { staging =>
      out.write.mode("overwrite")
        .option("header", "true")
        .option("sep", sep)
        .csv(staging)
    }
  }
}
