package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, each designed around
 * Spark's shuffle model so the same code holds at 100 TB:
 *
 *  - exact: hash-groupBy on a normalized key — one shuffle on the key, and
 *    the min-id winner is picked with a window or aggregate (map-side
 *    combinable).
 *  - MinHash + LSH: shingle → k minhashes (pure expression, no UDF) → band
 *    into b buckets → self-join per band bucket. The join key is
 *    (band_id, band_hash): candidate pairs only ever meet inside one
 *    shuffle partition per bucket; no O(n²) comparison happens anywhere.
 *  - SimHash: 64-bit weighted-projection fingerprint; near-dups share
 *    fingerprint prefixes (block key = 4 rotated 16-bit blocks).
 *  - n-gram Jaccard: exact verification of candidate pairs only (after LSH
 *    banding), never on the cross product.
 *
 * Hash functions are Spark's built-in xxhash64/crc32 with per-permutation
 * seeds — deterministic across runs and clusters, codegen'd.
 */
object Dedup {

  /** Normalized text key for exact dedup: lowercase, collapse whitespace. */
  def exactKey(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /**
   * Exact dedup: keep the lowest-id row per normalized key.
   * One shuffle on the key hash; survivors = count(groups).
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(exactKey(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Character shingles (n-grams) of the normalized text, distinct. */
  def shingles(text: Column, n: Int = 5): Column = {
    val norm = exactKey(text)
    val idxs = sequence(lit(1), greatest(length(norm) - (n - 1), lit(1)))
    array_distinct(transform(idxs, i => norm.substr(i, lit(n))))
  }

  /** Word shingles (token n-grams), distinct. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = split(exactKey(text), " ")
    val count = greatest(size(toks) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /**
   * k MinHash signatures: for each permutation seed s, min over shingles of
   * xxhash64(shingle, s). Pure expression tree — array_min over transform —
   * so the whole signature computes in one codegen'd projection.
   */
  def minhashSignature(shingleArr: Column, k: Int = 32): Column =
    array((0 until k).map { s =>
      array_min(transform(shingleArr, sh => xxhash64(sh, lit(s))))
    }: _*)

  /**
   * LSH banding: split the k-wide signature into `bands` bands of width
   * k/bands, hash each band. Emits (band_id, band_hash) pairs — the LSH
   * bucket keys. Probability two docs share ≥1 bucket ≈ 1-(1-j^r)^b.
   */
  def lshBucketKeys(signature: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", slice(signature, b * r + 1, r)), lit(b)).as("bucket"))
    }: _*)
  }

  /** Exact Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /**
   * MinHash-LSH near-dup candidate pairs with exact Jaccard verification.
   * Returns (id_a, id_b, jaccard) with id_a < id_b, deduplicated across
   * bands. The self-join shuffles on the bucket key only — candidate
   * generation is linear in Σ bucket², never n².
   */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      shingleN: Int = 5, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.6): DataFrame = {
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("bk", explode(lshBucketKeys(col("sig"), k, bands)))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.bucket"))
    val a = withSig.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSig.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** Survivors after MinHash near-dup removal: drop the higher id of each pair. */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 5, k: Int = 32, bands: Int = 8,
                   threshold: Double = 0.6): DataFrame = {
    val losers = minhashNearDups(df, textCol, idCol, shingleN, k, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * 64-bit SimHash from word tokens: for each bit position, sum +1/-1 votes
   * from xxhash64(token) bits; bit = 1 when the vote is positive. Expressed
   * with aggregate() over the token array — one pass, no UDF.
   */
  def simhash64(text: Column): Column = {
    val toks = array_distinct(split(exactKey(text), " "))
    val hashes = transform(toks, t => xxhash64(t))
    // votes per bit: sum over tokens of (bit set ? 1 : -1)
    val bitCols = (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bitCols.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs: block on 4×16-bit chunks (any pair with hamming
   * ≤ 3 shares at least one chunk — pigeonhole), verify with bit_count.
   */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withFp = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))
      .withColumn("blk", explode(array((0 until 4).map { i =>
        struct(lit(i).as("i"),
          shiftright(col("fp"), i * 16).bitwiseAND(0xFFFF).as("v"))
      }: _*)))
    val a = withFp.select(col("blk"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = withFp.select(col("blk"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Exact n-gram Jaccard similarity for all pairs above a threshold, using
   * shared-shingle inverted-index join (a pair is only compared if it shares
   * ≥1 shingle — linear in the posting lists, not n²). For corpora where
   * even that is too wide, use minhashNearDups which bounds candidates.
   */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
    val posting = sh.select(col("id"), col("sh"), explode(col("sh")).as("g"))
    val a = posting.select(col("g"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = posting.select(col("g"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
