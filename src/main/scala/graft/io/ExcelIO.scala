package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import scala.xml.XML

/**
 * Minimal xlsx reader/writer built on the JDK only (zip + XML) — no POI in
 * this environment, and none needed: xlsx is a zip of SpreadsheetML parts.
 * Mirrors the reference's Excel semantics (reference:
 * src/etl_core/receivers/files/excel/excel_helper.py:59-142,192-217,
 * excel_receiver.py:119-162):
 *
 *  - first row is the header;
 *  - sheet selected by name, or the first sheet;
 *  - all cells surface as STRINGS (typing is type_conversion's job);
 *  - the format's own hard cap (1,048,576 rows) bounds the data, so the
 *    writer materializes driver-side — Excel is not a big-data format,
 *    and the reference enforces the same ceiling (excel_receiver.py:141-146).
 *
 * The writer emits inline strings (no sharedStrings table); the reader
 * handles both inline strings and sharedStrings-indexed cells (the layout
 * openpyxl/Excel produce).
 */
object ExcelIO {

  val MaxRows = 1048576 // Excel's own sheet limit (excel_receiver.py:141-146)

  // ------------------------------------------------------------------ read

  /** Read a sheet into an all-string DataFrame; first row = header.
    * `.xls` dispatches to the BIFF8 reader (XlsIO), mirroring the
    * reference's per-extension engine split (excel_helper.py:27-32:
    * openpyxl for xlsx/xlsm, xlrd for xls). */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    if (path.toLowerCase.endsWith(".xls")) return readXls(spark, path, sheet)
    val zf = new ZipFile(path)
    try {
      val sheetPath = resolveSheetPath(zf, sheet)
      val shared = readSharedStrings(zf)
      val entry = zf.getEntry(sheetPath)
      require(entry != null, s"xlsx: missing $sheetPath")
      val xml = XML.load(zf.getInputStream(entry))
      val rows = (xml \ "sheetData" \ "row").map { r =>
        // The `r` (cell reference) attribute is OPTIONAL in OOXML: absent,
        // a cell occupies the column after the previous cell (writers like
        // streaming exporters omit it). A running index supplies that
        // default; colIndex("") would have yielded -1 and silently
        // corrupted the row map.
        var nextCol = 0
        (r \ "c").map { c =>
          val ref = (c \ "@r").text          // e.g. "B3", possibly absent
          val colIdx = if (ref.isEmpty) nextCol else colIndex(ref)
          nextCol = colIdx + 1
          val t = (c \ "@t").text
          val v = t match {
            case "s" => shared((c \ "v").text.toInt)          // sharedStrings
            case "inlineStr" => (c \ "is" \ "t").text
            case _ => (c \ "v").text
          }
          colIdx -> v
        }
      }
      require(rows.nonEmpty, s"xlsx: empty sheet in $path")
      val headerCells = rows.head.toMap
      val width = if (headerCells.isEmpty) 0 else headerCells.keys.max + 1
      val header = (0 until width).map(i => headerCells.getOrElse(i, s"_c$i"))
      val data = rows.tail.map { cells =>
        val m = cells.toMap
        Row.fromSeq((0 until width).map(i => m.get(i).orNull))
      }
      val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toIndexedSeq), schema)
    } finally zf.close()
  }

  /** Legacy-.xls branch of read: same all-string, first-row-header
    * contract over XlsIO's parsed cells. */
  private def readXls(spark: SparkSession, path: String,
                      sheet: Option[String]): DataFrame = {
    val (names, bySheet) = graft.io.XlsIO.parse(path)
    require(names.nonEmpty, s"xls: workbook has no sheets in $path")
    val name = sheet match {
      case Some(n) =>
        require(names.contains(n),
          s"xls: no sheet named '$n' (has ${names.mkString(", ")})")
        n
      case None => names.head
    }
    val cells = bySheet(name)
    require(cells.nonEmpty, s"xls: empty sheet in $path")
    val byRow = cells.groupBy(_._1)
    val rowIds = byRow.keys.toSeq.sorted
    val headerCells = byRow(rowIds.head).map(c => c._2 -> c._3).toMap
    val width = if (headerCells.isEmpty) 0 else headerCells.keys.max + 1
    val header = (0 until width).map(i => headerCells.getOrElse(i, s"_c$i"))
    val data = rowIds.tail.map { r =>
      val m = byRow(r).map(c => c._2 -> c._3).toMap
      Row.fromSeq((0 until width).map(i => m.get(i).orNull))
    }
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(data.toIndexedSeq), schema)
  }

  private def resolveSheetPath(zf: ZipFile, sheet: Option[String]): String = {
    val wb = XML.load(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
    val rels = XML.load(zf.getInputStream(zf.getEntry("xl/_rels/workbook.xml.rels")))
    val relTargets = (rels \ "Relationship").map(r =>
      (r \ "@Id").text -> (r \ "@Target").text).toMap
    val sheets = (wb \ "sheets" \ "sheet").map { s =>
      val rid = s.attribute("http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id")
        .map(_.text).getOrElse("")
      (s \ "@name").text -> rid
    }
    require(sheets.nonEmpty, "xlsx: workbook has no sheets")
    val rid = sheet match {
      case Some(name) => sheets.collectFirst { case (n, r) if n == name => r }
        .getOrElse(throw new IllegalArgumentException(
          s"xlsx: no sheet named '$name' (has ${sheets.map(_._1).mkString(", ")})"))
      case None => sheets.head._2
    }
    val target = relTargets.getOrElse(rid,
      throw new IllegalArgumentException(s"xlsx: unresolved sheet relationship $rid"))
    if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
  }

  private def readSharedStrings(zf: ZipFile): IndexedSeq[String] = {
    val e = zf.getEntry("xl/sharedStrings.xml")
    if (e == null) IndexedSeq.empty
    else {
      val xml = XML.load(zf.getInputStream(e))
      // direct <t> and rich-run <r><t> only: a descendant search would
      // also pick up phonetic runs (<rPh><t>, furigana) and concatenate
      // them into the cell value (openpyxl, the reference engine,
      // excludes rPh the same way)
      (xml \ "si").map(si =>
        ((si \ "t") ++ (si \ "r" \ "t")).map(_.text).mkString).toIndexedSeq
    }
  }

  /** "BC12" → 0-based column index of "BC". */
  private[io] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  // ----------------------------------------------------------------- write

  private[io] def colRef(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  /** Write a DataFrame to one xlsx file (driver-side; format-bounded).
    * `append=true` keeps the existing sheet's rows under the original
    * header (excel_helper.py:192-217 row-append parity): read-union-
    * rewrite — Excel is a whole-file format, there is no partial write. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
            append: Boolean = false): Unit = {
    val incoming = Flatten.flatten(df)
    val flat =
      if (append && java.nio.file.Files.exists(Paths.get(path))) {
        // read the NAMED sheet: appending to a file whose sheet has a
        // different name must fail loudly, not silently merge-and-rename
        val existing = read(df.sparkSession, path, Some(sheetName)) // all-string
        require(existing.columns.sorted.sameElements(incoming.columns.sorted),
          s"xlsx append: column mismatch (${existing.columns.mkString(",")} vs ${incoming.columns.mkString(",")})")
        existing.unionByName(incoming.select(incoming.columns.toSeq.map(c =>
          org.apache.spark.sql.functions.col(s"`$c`").cast("string").as(c)): _*))
      } else incoming
    // collect() below materializes before the stream re-creates the file,
    // so append's read-back cannot race its own overwrite
    val rows = flat.limit(MaxRows).collect()
    // the header occupies row 1, so data may fill at most MaxRows - 1
    require(rows.length <= MaxRows - 1,
      s"xlsx: ${rows.length} data rows + header exceed Excel's $MaxRows-row sheet limit")
    val header = flat.columns
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= "\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>"
      def rowXml(rowIdx: Int, values: Seq[Any]): Unit = {
        sb ++= s"""<row r="${rowIdx + 1}">"""
        values.zipWithIndex.foreach { case (v, ci) =>
          if (v != null) {
            val ref = s"${colRef(ci)}${rowIdx + 1}"
            v match {
              case n: Long   => sb ++= s"""<c r="$ref"><v>$n</v></c>"""
              case n: Int    => sb ++= s"""<c r="$ref"><v>$n</v></c>"""
              // NaN/Infinity are not valid OOXML numerics (Excel treats
              // the workbook as corrupt) — such cells stay blank, the
              // same null-sanitization the JSON writer applies
              case n: Double if n.isNaN || n.isInfinite => ()
              case n: Double => sb ++= s"""<c r="$ref"><v>$n</v></c>"""
              case n: Float if n.isNaN || n.isInfinite => ()
              case other =>
                sb ++= s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>"""
            }
          }
        }
        sb ++= "</row>"
      }
      rowXml(0, header.toSeq)
      rows.zipWithIndex.foreach { case (r, i) => rowXml(i + 1, r.toSeq) }
      sb ++= "</sheetData></worksheet>"
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }
}
