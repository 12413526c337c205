package graft.scale

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata structs. The Spark side — schemas,
 * partition sizing, batch iteration shape, output contracts — is real and
 * tested; the codec kernels (real JPEG/audio decode) are STUBBED with
 * deterministic fakes because media libraries are unavailable in this
 * environment. Swap `StubCodecs` for real decoders without touching the
 * dataflow.
 *
 * Design for 100 TB of media:
 *  - payloads stay in executor space end-to-end (mapPartitions over binary,
 *    never collect);
 *  - `spark.sql.files.maxPartitionBytes` governs scan parallelism — media
 *    rows are large, so feature extraction is sized by bytes not rows;
 *  - extracted features are small fixed-width vectors, so downstream joins/
 *    dedup run on feature tables orders of magnitude smaller than the media.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", mediaMetaType, nullable = false)))

  /**
   * STUB codec kernels — deterministic fakes standing in for image/audio
   * decoders. Each consumes real bytes and produces the correctly-shaped
   * output a real decoder would, derived only from the byte content, so
   * tests are reproducible.
   */
  object StubCodecs {
    /** "Decode" an image: fake (width, height, meanLuma) from byte stats. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      val n = bytes.length
      val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xFF).toDouble).sum / n
      (math.max(1, n % 1024), math.max(1, (n / 1024) % 1024 + 1), mean / 255.0)
    }

    /** "Resize": deterministic byte subsample to ≤ targetBytes. The
      * stride rounds UP — a floor stride of 1 for inputs under 2×target
      * would return the input unreduced (up to 2× the asked-for size). */
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
      if (bytes.length <= targetBytes) bytes
      else {
        val stride = (bytes.length + targetBytes - 1) / targetBytes
        bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray
      }

    /** "Frame-sample" a video payload into k fake frames (byte slices). */
    def frameSample(bytes: Array[Byte], k: Int): Seq[Array[Byte]] =
      if (bytes.isEmpty) Seq.fill(k)(Array.emptyByteArray)
      else (0 until k).map { i =>
        val start = (bytes.length.toLong * i / k).toInt
        val end = (bytes.length.toLong * (i + 1) / k).toInt
        java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1))
      }

    /** "Feature-extract": d-dim embedding from strided position-weighted
      * byte sums. Deliberately free of wrapping-overflow arithmetic so the
      * exact values are reproducible in plain SQL for correctness oracles:
      * k_j = (Σ_{i ≡ j (mod d)} byte_i · (i+1)) mod 1000, f_j = k_j/1000. */
    def features(bytes: Array[Byte], d: Int = 16): Array[Float] = {
      // overflow precondition, enforced loudly: worst case Σ ≈ 255·n²/(2d)
      // stays under Long.MaxValue only for n ≲ 1e9; a silent wrap would
      // produce negative (v % 1000) values and break the SQL-replayable
      // contract. Real payloads at this size belong in frameSample/resize
      // first.
      require(bytes.length <= (1 << 30),
        s"features: payload of ${bytes.length} bytes exceeds the 1 GiB " +
          "no-overflow bound; resize or frame-sample first")
      val acc = new Array[Long](d)
      var i = 0
      while (i < bytes.length) {
        acc(i % d) += (bytes(i) & 0xFF).toLong * (i + 1)
        i += 1
      }
      acc.map(v => (v % 1000).toFloat / 1000.0f)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_luma", DoubleType, nullable = true),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /**
   * Decode + feature-extract over partitions of binary payloads. The batch
   * shape (iterator-of-rows per partition, constant memory) is exactly what
   * a real decoder integration needs; only the kernel calls are stubs.
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mime = r.getString(2)
          val (w, h, luma) = StubCodecs.decodeImage(bytes)
          Row(id, mime, w, h, luma, StubCodecs.features(bytes).toSeq)
        }
      }(enc)
  }

  /** Synthesize a deterministic media table for tests/benches. */
  def syntheticMedia(spark: SparkSession, n: Int, bytesPerRow: Int = 4096): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(col("id").as("media_id"))
      .withColumn("payload",
        // deterministic pseudo-random bytes: sha2 chain sliced to length
        expr(s"""unhex(substring(repeat(sha2(cast(media_id as string), 256), ${bytesPerRow / 32 + 1}), 1, ${bytesPerRow * 2}))"""))
      .withColumn("meta", struct(lit("image/fake").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")))
  }
}
