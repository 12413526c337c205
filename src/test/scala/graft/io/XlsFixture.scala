package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/**
 * Test-side generator of minimal `.xls` files (OLE2/CFB + BIFF8), built
 * from the public MS-CFB and MS-XLS layouts. No xls writer exists in this
 * offline environment (the reference itself cannot write .xls either), so
 * the read path is proven against files assembled record-by-record here —
 * both container layouts (ministream for streams under the 4096 cutoff,
 * regular FAT sectors above it) and an SST that splits a string across a
 * CONTINUE boundary.
 */
object XlsFixture {

  private def le16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()

  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(data.length) ++ data

  private def bof(substreamType: Int): Array[Byte] =
    rec(0x0809, le16(0x0600) ++ le16(substreamType) ++ le16(0x0DBB) ++
      le16(0x07CC) ++ le32(0) ++ le32(0))

  private val eof: Array[Byte] = rec(0x000A, Array.empty)

  /** Compressed (8-bit) inline sheet name. */
  private def boundsheet(offset: Int, name: String): Array[Byte] =
    rec(0x0085, le32(offset) ++ le16(0) ++
      Array(name.length.toByte, 0.toByte) ++ name.getBytes("ISO-8859-1"))

  /** SST records for `strings`; `splitAt` forces a CONTINUE record that
    * breaks INSIDE string number splitAt (after 2 chars), restarting with
    * a fresh grbit byte — the hairy real-world case. Wide (UTF-16) chosen
    * per string when any char exceeds latin-1. */
  def sstRecords(strings: Seq[String], splitInside: Option[Int] = None): Array[Byte] = {
    def encoded(s: String): (Array[Byte], Boolean) = {
      val wide = s.exists(_ > 0xFF)
      (if (wide) s.getBytes("UTF-16LE") else s.getBytes("ISO-8859-1"), wide)
    }
    splitInside match {
      case None =>
        val body = new ByteArrayOutputStream()
        body.write(le32(strings.size)); body.write(le32(strings.size))
        strings.foreach { s =>
          val (chars, wide) = encoded(s)
          body.write(le16(s.length)); body.write(if (wide) 1 else 0)
          body.write(chars)
        }
        rec(0x00FC, body.toByteArray)
      case Some(idx) =>
        // first record: strings before idx + the first 2 chars of strings(idx)
        val first = new ByteArrayOutputStream()
        first.write(le32(strings.size)); first.write(le32(strings.size))
        strings.take(idx).foreach { s =>
          val (chars, wide) = encoded(s)
          first.write(le16(s.length)); first.write(if (wide) 1 else 0)
          first.write(chars)
        }
        val s = strings(idx)
        val (chars, wide) = encoded(s)
        val headChars = 2 * (if (wide) 2 else 1)
        first.write(le16(s.length)); first.write(if (wide) 1 else 0)
        first.write(chars, 0, headChars)
        // CONTINUE: fresh grbit, rest of the split string, remaining strings
        val cont = new ByteArrayOutputStream()
        cont.write(if (wide) 1 else 0)
        cont.write(chars, headChars, chars.length - headChars)
        strings.drop(idx + 1).foreach { t =>
          val (c2, w2) = encoded(t)
          cont.write(le16(t.length)); cont.write(if (w2) 1 else 0)
          cont.write(c2)
        }
        rec(0x00FC, first.toByteArray) ++ rec(0x003C, cont.toByteArray)
    }
  }

  sealed trait Cell { def row: Int; def col: Int }
  final case class SstCell(row: Int, col: Int, isst: Int) extends Cell
  final case class InlineCell(row: Int, col: Int, s: String) extends Cell
  final case class NumCell(row: Int, col: Int, d: Double) extends Cell
  final case class RkIntCell(row: Int, col: Int, v: Int, div100: Boolean = false) extends Cell
  final case class BoolCell(row: Int, col: Int, v: Boolean) extends Cell

  private def cellRec(c: Cell): Array[Byte] = c match {
    case SstCell(r, cl, i) => rec(0x00FD, le16(r) ++ le16(cl) ++ le16(0) ++ le32(i))
    case InlineCell(r, cl, s) => rec(0x0204, le16(r) ++ le16(cl) ++ le16(0) ++
      le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1"))
    case NumCell(r, cl, d) => rec(0x0203, le16(r) ++ le16(cl) ++ le16(0) ++ le64(d))
    case RkIntCell(r, cl, v, div) =>
      val rk = (v << 2) | 2 | (if (div) 1 else 0)
      rec(0x027E, le16(r) ++ le16(cl) ++ le16(0) ++ le32(rk))
    case BoolCell(r, cl, v) => rec(0x0205, le16(r) ++ le16(cl) ++ le16(0) ++
      Array[Byte](if (v) 1 else 0, 0))
  }

  /** Workbook stream: globals (BOF, BOUNDSHEET per sheet, SST, EOF) then
    * one substream per sheet. */
  def workbookStream(sst: Array[Byte],
                     sheets: Seq[(String, Seq[Cell])]): Array[Byte] = {
    val sheetStreams = sheets.map { case (_, cells) =>
      bof(0x0010) ++ cells.flatMap(cellRec).toArray ++ eof
    }
    // globals length depends on itself only through fixed-size BOUNDSHEETs
    def globals(offsets: Seq[Int]): Array[Byte] =
      bof(0x0005) ++
        sheets.zip(offsets).flatMap { case ((n, _), o) => boundsheet(o, n) }.toArray ++
        sst ++ eof
    val glen = globals(sheets.map(_ => 0)).length
    val offsets = sheetStreams.scanLeft(glen)(_ + _.length).init
    globals(offsets) ++ sheetStreams.flatten.toArray
  }

  // --------------------------------------------------------------- CFB

  private val FATSECT = 0xFFFFFFFD
  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FREESECT = 0xFFFFFFFF

  private def dirEntry(name: String, tpe: Int, start: Int, size: Int,
                       child: Int = FREESECT): Array[Byte] = {
    val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    val n = name.getBytes("UTF-16LE")
    b.put(n, 0, math.min(n.length, 62))
    b.putShort(64, ((name.length + 1) * 2).toShort)
    b.put(66, tpe.toByte)
    b.put(67, 1.toByte) // black
    b.putInt(68, FREESECT); b.putInt(72, FREESECT); b.putInt(76, child)
    b.putInt(116, start)
    b.putInt(120, size)
    b.array()
  }

  private def header(numFat: Int, firstDir: Int, firstMiniFat: Int,
                     numMiniFat: Int, difat0: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(0, 0xE11AB1A1E011CFD0L)
    b.putShort(24, 0x003E.toShort) // minor
    b.putShort(26, 0x0003.toShort) // major v3
    b.putShort(28, 0xFFFE.toShort) // little-endian
    b.putShort(30, 9.toShort)      // 512-byte sectors
    b.putShort(32, 6.toShort)      // 64-byte minisectors
    b.putInt(44, numFat)
    b.putInt(48, firstDir)
    b.putInt(56, 4096)             // mini cutoff
    b.putInt(60, firstMiniFat)
    b.putInt(64, numMiniFat)
    b.putInt(68, ENDOFCHAIN)       // no DIFAT sectors
    b.putInt(72, 0)
    b.putInt(76, difat0)
    (1 until 109).foreach(i => b.putInt(76 + 4 * i, FREESECT))
    b.array()
  }

  private def pad(a: Array[Byte], unit: Int): Array[Byte] =
    if (a.length % unit == 0) a else a ++ new Array[Byte](unit - a.length % unit)

  /** Wrap a workbook stream in a CFB container. Streams under 4096 bytes
    * go through the ministream + miniFAT path; larger ones through
    * regular FAT sectors — exactly the split real writers produce. */
  def cfb(workbook: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (workbook.length < 4096) {
      val mini = pad(workbook, 64)
      val nMiniSectors = mini.length / 64
      val miniContainer = pad(mini, 512)
      val nContainerSectors = miniContainer.length / 512
      // sectors: 0=FAT, 1=dir, 2=miniFAT, 3..=mini stream container
      val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      fat.putInt(0, FATSECT); fat.putInt(4, ENDOFCHAIN); fat.putInt(8, ENDOFCHAIN)
      (0 until nContainerSectors).foreach { i =>
        fat.putInt(12 + 4 * i, if (i == nContainerSectors - 1) ENDOFCHAIN else 3 + i + 1)
      }
      (3 + nContainerSectors until 128).foreach(i => fat.putInt(4 * i, FREESECT))
      val minifat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      (0 until nMiniSectors).foreach { i =>
        minifat.putInt(4 * i, if (i == nMiniSectors - 1) ENDOFCHAIN else i + 1)
      }
      (nMiniSectors until 128).foreach(i => minifat.putInt(4 * i, FREESECT))
      val dir = pad(
        dirEntry("Root Entry", 5, 3, miniContainer.length, child = 1) ++
          dirEntry("Workbook", 2, 0, workbook.length) ++
          new Array[Byte](0), 512)
      out.write(header(numFat = 1, firstDir = 1, firstMiniFat = 2,
        numMiniFat = 1, difat0 = 0))
      out.write(fat.array()); out.write(dir); out.write(minifat.array())
      out.write(miniContainer)
    } else {
      val wb = pad(workbook, 512)
      val nWb = wb.length / 512
      // sectors: 0=FAT, 1=dir, 2..=workbook  (fits one FAT sector if small)
      require(2 + nWb <= 128, "fixture too large for a one-FAT-sector layout")
      val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      fat.putInt(0, FATSECT); fat.putInt(4, ENDOFCHAIN)
      (0 until nWb).foreach { i =>
        fat.putInt(8 + 4 * i, if (i == nWb - 1) ENDOFCHAIN else 2 + i + 1)
      }
      (2 + nWb until 128).foreach(i => fat.putInt(4 * i, FREESECT))
      val dir = pad(
        dirEntry("Root Entry", 5, ENDOFCHAIN, 0, child = 1) ++
          dirEntry("Workbook", 2, 2, workbook.length), 512)
      out.write(header(numFat = 1, firstDir = 1, firstMiniFat = ENDOFCHAIN,
        numMiniFat = 0, difat0 = 0))
      out.write(fat.array()); out.write(dir); out.write(wb)
    }
    out.toByteArray
  }
}
