package graft.scale

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Fixture-regeneration guard for the two driver-gate queries whose
 * engine/oracle agreement is a property of the DATA, not the code:
 *
 *  - `dedup_minhash`: the DuckDB oracle computes EXACT all-pairs
 *    char-5-shingle Jaccard >= 0.6, the engine verifies only
 *    MinHash-LSH-banded candidates (the whole point at 100 TB). A pair
 *    at jaccard ~ 0.6 can evade all 16 word-trigram bands with
 *    probability ~(1-0.6^2)^16 ~ 0.08% — today no fixture pair is
 *    within ±0.29 of the threshold, so agreement is deterministic.
 *  - `dedup_embedding`: exact all-pairs cosine >= 0.95 oracle vs
 *    random-hyperplane-banded candidates (16 bands × r=10). Today the
 *    fixture's MAXIMUM pairwise cosine is ~0.51 — the gate passes with
 *    zero losers on both sides, i.e. VACUOUSLY; any regeneration that
 *    introduces real near-dup vectors starts exercising LSH recall.
 *
 * A regenerated corpus that lands a pair near either threshold (or past
 * the embedding LSH's recall) would fail the driver gate as a mystery
 * hash mismatch with no code change. These tests fail FIRST, at suite
 * time, with the cause named:
 *
 *  1. recall identity — the engine's banded pair set must equal the
 *     exact all-pairs set (both computed here, same shingle/cosine
 *     kernels the gate uses). Hyperplanes and bands are deterministic,
 *     so on a FIXED corpus this either always holds or never does.
 *  2. threshold margin — no exact pair within the fragility band around
 *     the gate threshold (±0.05 Jaccard / ±0.02 cosine), where LSH miss
 *     probability is material and where float-rounding could flip the
 *     >= comparison between Spark and DuckDB.
 *
 * `dedup_simhash` needs no guard: maxHamming=3 over 4×15-bit blocks
 * means every true pair shares >= 1 exact block (pigeonhole), so the
 * block-join candidate generation has recall exactly 1 on ANY corpus.
 * `dedup_ngram_jaccard` and the cluster gates are deterministic
 * posting-join exact computations on both sides.
 */
class FixtureGuardSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"

  /** Exact all-pairs char-n-shingle Jaccard via a posting-list join —
    * the oracle's CTE re-expressed with the ENGINE's own shingle kernel,
    * so the only degree of freedom under test is LSH recall. */
  private def exactShinglePairs(n: Int) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), n).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("nn"))
    val post = sh.select(col("id"), explode(col("sh")).as("g"))
    post.select(col("g"), col("id").as("id_a"))
      .join(post.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("nn").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("nn").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
  }

  test("dedup_minhash gate guard: LSH recall identity + Jaccard threshold margin on the committed corpus") {
    val exact = exactShinglePairs(5).cache()
    try {
      val near = exact
        .filter(col("jaccard") > 0.55 && col("jaccard") < 0.65)
        .collect()
      assert(near.isEmpty,
        s"FIXTURE GUARD (dedup_minhash): documents.parquet now holds ${near.length} " +
          s"pair(s) with char-5 Jaccard within ±0.05 of the gate threshold 0.6 " +
          s"(${near.take(5).mkString(", ")}). The engine's 16-band LSH can miss " +
          "such a pair (~0.08%/pair) and Spark/DuckDB could round the >= " +
          "comparison apart — the driver gate would hash-mismatch with no code " +
          "change. Regenerate the corpus away from the threshold, or re-derive " +
          "the gate (see SparkEntry.qDedupMinhash).")
      val exactSet = exact.filter(col("jaccard") >= 0.6)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val engineSet = Dedup.minhashNearDups(
        spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id",
        shingleN = 5, k = 32, bands = 16, threshold = 0.6)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exactSet.nonEmpty, // the gate must keep testing something real
        "FIXTURE GUARD (dedup_minhash): the corpus no longer contains ANY " +
          "char-5 Jaccard >= 0.6 pair — the gate would pass vacuously.")
      assert(engineSet === exactSet,
        s"FIXTURE GUARD (dedup_minhash): LSH recall broke on this corpus — " +
          s"missed ${(exactSet -- engineSet).take(5)}, " +
          s"spurious ${(engineSet -- exactSet).take(5)}. The driver gate " +
          "(exact-Jaccard oracle) will hash-mismatch. This is banding recall, " +
          "not a Jaccard bug: q_dedup_ngram pins the same exact semantics " +
          "with a deterministic candidate set.")
    } finally exact.unpersist()
  }

  test("dedup_embedding gate guard: hyperplane-LSH recall identity + cosine threshold margin") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val exact = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("cos"))
      .cache()
    try {
      val near = exact.filter(col("cos") > 0.93 && col("cos") < 0.97).collect()
      assert(near.isEmpty,
        s"FIXTURE GUARD (dedup_embedding): embeddings.parquet now holds " +
          s"${near.length} pair(s) with cosine within ±0.02 of the gate " +
          s"threshold 0.95 (${near.take(5).mkString(", ")}) — hyperplane-LSH " +
          "miss probability is material there (~0.1%/pair at 16 bands × r=10) " +
          "and float rounding could flip the >= comparison between engines. " +
          "Regenerate away from the threshold or re-derive the gate.")
      val exactSet = exact.filter(col("cos") >= 0.95)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val engineSet = Similarity.embeddingNearDups(e, "embedding", "vec_id",
        simThreshold = 0.95, dim = 64, bands = 16, r = 10)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // NOTE: on today's corpus both sides are EMPTY (max pairwise cosine
      // ~0.51) — the gate is vacuous, which this identity makes visible
      // and keeps honest the day regeneration changes it.
      assert(engineSet === exactSet,
        s"FIXTURE GUARD (dedup_embedding): hyperplane-LSH recall broke on " +
          s"this corpus — missed ${(exactSet -- engineSet).take(5)}, " +
          s"spurious ${(engineSet -- exactSet).take(5)}. The driver gate " +
          "(exact-cosine oracle) will hash-mismatch with no code change.")
    } finally exact.unpersist()
  }
}
