package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import XlsFixture._

class XlsIOSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val p = Paths.get("target", "test-tmp", "xls", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  test("ministream .xls: LABELSST/LABEL/NUMBER/RK/BOOLERR cells read as strings") {
    val sst = sstRecords(Seq("id", "name", "alice", "bö"))
    val cells = Seq(
      SstCell(0, 0, 0), SstCell(0, 1, 1), InlineCell(0, 2, "score"),
      SstCell(1, 0, 2), NumCell(1, 1, 1.5), RkIntCell(1, 2, 42),
      SstCell(2, 0, 3), RkIntCell(2, 1, 314, div100 = true), BoolCell(2, 2, v = true))
    val bytes = cfb(workbookStream(sst, Seq("Sheet1" -> cells)))
    assert(bytes.length < 4096 + 512) // really exercises the ministream path
    val path = tmp("mini.xls")
    Files.write(Paths.get(path), bytes)

    val df = ExcelIO.read(spark, path)
    assert(df.columns.toSeq === Seq("id", "name", "score"))
    val got = df.orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("alice", "1.5", "42"),    // NUMBER integral-less double, RK int
      ("bö", "3.14", "TRUE")))   // RK div-100, BOOLERR
  }

  test("regular-FAT .xls with an SST string split across CONTINUE") {
    // pad the SST over the 4096 mini cutoff; split inside string index 2
    val filler = (0 until 260).map(i => s"filler-string-$i")
    val strings = Seq("id", "val", "brokenstring") ++ filler
    val sst = sstRecords(strings, splitInside = Some(2))
    val cells = Seq(
      SstCell(0, 0, 0), SstCell(0, 1, 1),
      SstCell(1, 0, 2), SstCell(1, 1, 3 + 7)) // a filler string as a value
    val wb = workbookStream(sst, Seq("Data" -> cells))
    assert(wb.length >= 4096) // really exercises the regular-sector path
    val path = tmp("big.xls")
    Files.write(Paths.get(path), cfb(wb))

    val df = ExcelIO.read(spark, path, sheet = Some("Data"))
    assert(df.columns.toSeq === Seq("id", "val"))
    val row = df.collect().head
    assert(row.getString(0) === "brokenstring") // stitched across CONTINUE
    assert(row.getString(1) === "filler-string-7")
    // unknown sheet fails loudly, like the xlsx path
    intercept[IllegalArgumentException] { ExcelIO.read(spark, path, Some("Nope")) }
  }

  test("multi-sheet .xls: selection by name, first sheet by default") {
    val sst = sstRecords(Seq("a", "x1", "b", "y1"))
    val wb = workbookStream(sst, Seq(
      "First" -> Seq(SstCell(0, 0, 0), SstCell(1, 0, 1)),
      "Second" -> Seq(SstCell(0, 0, 2), SstCell(1, 0, 3))))
    val path = tmp("multi.xls")
    Files.write(Paths.get(path), cfb(wb))
    assert(ExcelIO.read(spark, path).columns.toSeq === Seq("a"))
    val second = ExcelIO.read(spark, path, Some("Second"))
    assert(second.columns.toSeq === Seq("b"))
    assert(second.collect().head.getString(0) === "y1")
  }
}
