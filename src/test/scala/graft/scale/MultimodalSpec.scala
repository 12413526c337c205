package graft.scale

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ImageCodecs decodes REAL container bytes: fixtures are produced by the
  * JDK's own encoders (javax.imageio writes genuine JPEG/PNG streams), so
  * the header parser is tested against real encoder output, not
  * hand-crafted byte arrays; GIF adds a spec-conformant hand-built header
  * (ImageIO has no GIF writer guarantee across JDKs). */
class MultimodalSpec extends SparkTestBase {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK $fmt writer")
    bos.toByteArray
  }

  test("PNG IHDR dimensions decode from real JDK-encoded bytes") {
    val bytes = encode("png", 37, 21)
    assert(Multimodal.ImageCodecs.dimensions(bytes) === Some(("image/png", 37, 21)))
  }

  test("JPEG SOF dimensions decode from real JDK-encoded bytes") {
    // the JDK JPEG encoder emits JFIF APP0 + DQT + SOF0 + DHT + SOS; the
    // parser must walk the variable-length segments to reach the SOF
    val bytes = encode("jpg", 64, 48)
    assert(Multimodal.ImageCodecs.dimensions(bytes) === Some(("image/jpeg", 64, 48)))
  }

  test("GIF logical screen descriptor decodes (hand-built, spec-conformant)") {
    val b = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x0A, 0x00, 0x05, 0x00, 0x00, 0x00, 0x00) // 10x5 LE + flags
    assert(Multimodal.ImageCodecs.dimensions(b) === Some(("image/gif", 10, 5)))
  }

  test("non-image payloads are rejected, not misparsed") {
    val junk = Array.tabulate[Byte](4096)(i => (i * 131).toByte)
    assert(Multimodal.ImageCodecs.dimensions(junk) === None)
    assert(Multimodal.ImageCodecs.dimensions(Array.emptyByteArray) === None)
    // truncated PNG signature alone must not decode
    val sigOnly = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    assert(Multimodal.ImageCodecs.dimensions(sigOnly) === None)
    // JPEG SOI followed by garbage (no marker) must not decode
    assert(Multimodal.ImageCodecs.dimensions(
      Array(0xFF, 0xD8, 0x12, 0x34).map(_.toByte)) === None)
  }

  test("extractFeatures: real containers get real dims, others the declared fallback") {
    import spark.implicits._
    val png = encode("png", 37, 21)
    val fake = Array.tabulate[Byte](2500)(i => (i * 7).toByte)
    val rows = Seq((1L, png, "image/png"), (2L, fake, "application/blob"))
      .toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        struct(col("mime"), lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
    val out = Multimodal.extractFeatures(rows)
      .orderBy("media_id").collect()
    assert(out(0).getString(1) === "image/png")
    assert((out(0).getInt(2), out(0).getInt(3)) === ((37, 21)))
    // fallback: mime passes through, dims from byte stats (n=2500)
    assert(out(1).getString(1) === "application/blob")
    assert((out(1).getInt(2), out(1).getInt(3)) === ((2500 % 1024, 2500 / 1024 % 1024 + 1)))
    assert(out.forall(_.getSeq[Float](5).size === 16))
  }

  test("ImageCodecs never throws and never fabricates dims (adversarial bytes)") {
    val rnd = new scala.util.Random(0xC0DEC5)
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    def randomBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    }
    val adversarial: Seq[Array[Byte]] =
      (0 until 200).map(i => randomBytes(i % 64)) ++            // short garbage
      (0 until 100).map(_ => randomBytes(512)) ++               // long garbage
      (0 until 50).map(_ => Array(0xFF, 0xD8).map(_.toByte) ++ randomBytes(64)) ++ // SOI+junk
      (0 until 50).map(_ => pngSig ++ randomBytes(32)) ++       // PNG sig+junk
      (0 until 20).map(_ => "GIF89a".getBytes("US-ASCII") ++ randomBytes(8))
    adversarial.foreach { b =>
      Multimodal.ImageCodecs.dimensions(b) match {
        case Some((mime, w, h)) =>
          assert(w >= 1 && h >= 1 && mime.startsWith("image/"))
        case None => ()
      }
    }
    // every truncation of a REAL encoded image: no throw; if dims come
    // back they must be the true ones (the header either parses whole or
    // not at all — never misreads)
    for (fmt <- Seq("png", "jpg")) {
      val full = encode(fmt, 33, 17)
      (0 to full.length).foreach { n =>
        Multimodal.ImageCodecs.dimensions(java.util.Arrays.copyOf(full, n)) match {
          case Some((_, w, h)) => assert((w, h) === ((33, 17)), s"$fmt prefix $n")
          case None => ()
        }
      }
    }
  }

  test("ByteKernels: resize bound, frame count, feature determinism") {
    val bytes = Array.tabulate[Byte](10000)(i => (i * 13).toByte)
    assert(Multimodal.ByteKernels.resize(bytes, 1000).length <= 1000)
    assert(Multimodal.ByteKernels.resize(Array[Byte](1, 2), 10).toSeq === Seq[Byte](1, 2))
    val frames = Multimodal.ByteKernels.frameSample(bytes, 7)
    assert(frames.size === 7 && frames.map(_.length).sum >= bytes.length)
    val f1 = Multimodal.ByteKernels.features(bytes)
    val f2 = Multimodal.ByteKernels.features(bytes.clone())
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(v => v >= 0.0f && v < 1.0f))
  }
}
