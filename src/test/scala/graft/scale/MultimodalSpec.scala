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

  // ------------------------------------------------------ audio/video

  /** Genuine RIFF/WAVE bytes from the JDK's own encoder (javax.sound). */
  private def encodeWav(rateHz: Int, channels: Int, seconds: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      rateHz.toFloat, 16, channels, true, false)
    val nFrames = (rateHz * seconds).toLong
    val pcm = new Array[Byte]((nFrames * channels * 2).toInt)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def be32(v: Long): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  /** Spec-conformant minimal MP4: ftyp + moov(mvhd). v0 layout unless
    * v1 (64-bit creation/modification/duration times). */
  private def encodeMp4(timescale: Long, duration: Long, v1: Boolean = false): Array[Byte] = {
    val ftyp = be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(512)
    val payload =
      if (!v1)
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ // v0+flags, times
          be32(timescale) ++ be32(duration) ++ new Array[Byte](80)
      else
        Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ // v1+flags, times
          be32(timescale) ++ be64(duration) ++ new Array[Byte](80)
    val mvhd = be32(8L + payload.length) ++ "mvhd".getBytes("US-ASCII") ++ payload
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    ftyp ++ moov
  }

  test("WAV fmt+data chunks decode from real JDK-encoded bytes") {
    val bytes = encodeWav(16000, 2, 1.0)
    val meta = Multimodal.AvCodecs.probe(bytes)
    assert(meta === Some(Multimodal.AvCodecs.AvMeta(
      "audio/wav", Some(16000), Some(2), Some(1000L))))
    // mono at another rate, half a second
    val mono = Multimodal.AvCodecs.probe(encodeWav(8000, 1, 0.5)).get
    assert((mono.sampleRate, mono.channels, mono.durationMs) ===
      ((Some(8000), Some(1), Some(500L))))
  }

  test("MP4 mvhd duration decodes for v0 and v1 layouts (hand-built, spec-conformant)") {
    assert(Multimodal.AvCodecs.probe(encodeMp4(600, 1200)) ===
      Some(Multimodal.AvCodecs.AvMeta("video/mp4", None, None, Some(2000L))))
    assert(Multimodal.AvCodecs.probe(encodeMp4(90000, 45000, v1 = true)) ===
      Some(Multimodal.AvCodecs.AvMeta("video/mp4", None, None, Some(500L))))
  }

  test("non-AV payloads are rejected, not misparsed") {
    val junk = Array.tabulate[Byte](4096)(i => (i * 131).toByte)
    assert(Multimodal.AvCodecs.probe(junk) === None)
    assert(Multimodal.AvCodecs.probe(Array.emptyByteArray) === None)
    // RIFF but not WAVE (e.g. AVI's RIFF form) must not parse as wav
    val avi = "RIFF".getBytes("US-ASCII") ++ be32(100).reverse ++
      "AVI ".getBytes("US-ASCII") ++ new Array[Byte](32)
    assert(Multimodal.AvCodecs.probe(avi) === None)
    // ftyp with a truncated moov must not fabricate a duration
    val trunc = encodeMp4(600, 1200).dropRight(20)
    assert(Multimodal.AvCodecs.probe(trunc) === None)
  }

  test("AvCodecs never throws and never fabricates metadata (adversarial bytes)") {
    val rnd = new scala.util.Random(0xA7C0DE5)
    def randomBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    }
    val adversarial: Seq[Array[Byte]] =
      (0 until 200).map(i => randomBytes(i % 64)) ++
      (0 until 100).map(_ => randomBytes(512)) ++
      (0 until 50).map(_ => "RIFF".getBytes("US-ASCII") ++ randomBytes(40)) ++
      (0 until 50).map(_ => be32(16) ++ "ftyp".getBytes("US-ASCII") ++ randomBytes(40))
    adversarial.foreach { b =>
      Multimodal.AvCodecs.probe(b) match {
        case Some(m) =>
          assert(m.mime == "audio/wav" || m.mime == "video/mp4")
          assert(m.durationMs.forall(_ >= 0L))
          assert(m.sampleRate.forall(_ >= 1) && m.channels.forall(_ >= 1))
        case None => ()
      }
    }
    // every truncation of real containers: no throw; if metadata comes
    // back it must be the true value (parse whole or not at all)
    val wavFull = encodeWav(16000, 2, 0.25)
    (0 to wavFull.length).foreach { n =>
      Multimodal.AvCodecs.probe(java.util.Arrays.copyOf(wavFull, n)).foreach { m =>
        assert((m.sampleRate, m.channels, m.durationMs) ===
          ((Some(16000), Some(2), Some(250L))), s"wav prefix $n")
      }
    }
    val mp4Full = encodeMp4(600, 1200)
    (0 to mp4Full.length).foreach { n =>
      Multimodal.AvCodecs.probe(java.util.Arrays.copyOf(mp4Full, n)).foreach { m =>
        assert(m.durationMs === Some(2000L), s"mp4 prefix $n")
      }
    }
  }

  test("extractFeatures emits AV metadata for recognized containers") {
    import spark.implicits._
    val wav = encodeWav(16000, 2, 1.0)
    val mp4 = encodeMp4(600, 1800)
    val fake = Array.tabulate[Byte](999)(i => (i * 7).toByte)
    val rows = Seq((1L, wav, "application/blob"), (2L, mp4, "application/blob"),
      (3L, fake, "application/blob"))
      .toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        struct(col("mime"), lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
    val out = Multimodal.extractFeatures(rows).orderBy("media_id").collect()
    // WAV: real mime + audio fields, no dims
    assert(out(0).getString(1) === "audio/wav")
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert((out(0).getLong(6), out(0).getInt(7), out(0).getInt(8)) ===
      ((1000L, 16000, 2)))
    // MP4: real mime + duration only
    assert(out(1).getString(1) === "video/mp4")
    assert(out(1).getLong(6) === 3000L)
    assert(out(1).isNullAt(7) && out(1).isNullAt(8))
    // fallback: declared mime, synthetic dims, no AV fields
    assert(out(2).getString(1) === "application/blob")
    assert(out(2).isNullAt(6) && out(2).isNullAt(7) && out(2).isNullAt(8))
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
