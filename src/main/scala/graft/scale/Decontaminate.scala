package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag (or drop) corpus documents that share
 * word n-grams with an evaluation/benchmark set — the standard
 * train/test-overlap guard of large-scale training-data pipelines
 * (GPT-3 §C / Llama / Dolma all ship a variant of this n-gram rule).
 *
 * Tokenization and shingling reuse the dedup family's normalized word
 * n-grams (Dedup.wordShingles: lowercase, whitespace-collapse, distinct
 * token n-grams via the codegen'd WordShingles expression), so one
 * text-normalization contract serves dedup AND decontamination.
 *
 * Two physical strategies, one semantics (DecontaminateSpec pins their
 * equality; the gate oracle replays the rule in DuckDB SQL):
 *
 *  - `broadcast` (default): the DISTINCT benchmark n-grams are collected
 *    (bounded: benchmark sets are evaluation data, orders of magnitude
 *    smaller than the corpus; a hard cap fails loudly past
 *    [[MaxBroadcastGrams]]) and probed via the codegen'd CountInSet
 *    hash-set expression. The 100 TB corpus side is then a NARROW MAP —
 *    zero shuffle, no corpus explode, stays inside whole-stage codegen
 *    next to the parquet scan. This is the 100 TB path: eval suites are
 *    MBs while the corpus is TBs.
 *  - `join`: for benchmark sets past the broadcast cap — corpus grams
 *    explode to (id, gram) pairs (ids only, text never shuffled), inner
 *    join the distinct benchmark grams on the gram key, count hits per
 *    id, left-join the counts back. Three shuffles, all ids/grams only.
 *  - `bloom`: the middle path when the benchmark exceeds the exact
 *    broadcast cap but the corpus explode is the cost to kill — a Bloom
 *    filter of the benchmark grams (~12 bits/element at the default 1%
 *    FPR vs the exact set's full strings) prefilters via the codegen'd
 *    CountInBloom narrow map. ZERO bloom hits proves zero true hits
 *    (no false negatives), so only CANDIDATE docs (>= 1 bloom hit:
 *    true hits + the FPR sliver) pay the exact posting join — the
 *    explode shrinks from the whole corpus to roughly its contaminated
 *    fraction. Results are EXACT and identical to the other two
 *    strategies (DecontaminateSpec + ScalePropertySpec pin all three).
 *
 * n_hits = |distinct corpus-doc n-grams ∩ benchmark n-grams| (both sides
 * distinct, so multiplicity never inflates the overlap); a document is
 * contaminated when n_hits >= min_overlap. Null/empty text → 0 hits,
 * kept (nothing to leak).
 */
object Decontaminate {

  /** Hard cap on the collected benchmark gram set (broadcast strategy).
    * ~2M grams ≈ a few hundred MB of probe set — far beyond any real
    * eval suite; past it the join strategy is the right plan anyway. */
  val MaxBroadcastGrams = 2000000

  /** Default corpus-side document-frequency cap for the pairs() posting
    * join — the same stop-phrase guard as Dedup.ngramJaccardPairs'
    * maxDf. Inert on anything but a gram shared by >100k corpus docs,
    * where it bounds the worst join bucket at maxDf × (benchmark df)
    * rows instead of (corpus df) × (benchmark df). */
  val DefaultPairsMaxDf = 100000

  /** Distinct normalized word n-grams of a text column (the dedup
    * family's contract: Dedup.wordShingles). */
  def grams(text: Column, n: Int): Column = Dedup.wordShingles(text, n)

  /**
   * Corpus with `n_hits` (long) and `contaminated` (boolean) appended.
   *
   * @param strategy "broadcast" (default) | "join" — see object doc.
   */
  def flag(corpus: DataFrame, bench: DataFrame,
           textCol: String = "text", idCol: String = "doc_id",
           n: Int = 3, minOverlap: Int = 1,
           strategy: String = "broadcast"): DataFrame = {
    require(n >= 1, s"decontaminate: n must be >= 1, got $n")
    require(minOverlap >= 1,
      s"decontaminate: min_overlap must be >= 1, got $minOverlap")
    // the audit columns are OUTPUTS: silently overwriting an earlier
    // pass's n_hits/contaminated (re-flagging against a second benchmark)
    // would destroy its audit trail; the join strategy's temp names must
    // also be free or the join-back reference turns ambiguous
    for (reserved <- Seq("n_hits", "contaminated", "__decon_id", "__decon_hits",
        "__decon_cand"))
      require(!corpus.columns.contains(reserved),
        s"decontaminate: corpus already has a '$reserved' column — " +
          "rename or drop it first (flag() appends n_hits/contaminated)")
    strategy match {
      case "broadcast" => flagBroadcast(corpus, bench, textCol, n, minOverlap)
      case "join"      => flagJoin(corpus, bench, textCol, idCol, n, minOverlap)
      case "bloom"     => flagBloom(corpus, bench, textCol, idCol, n, minOverlap)
      case other => throw new IllegalArgumentException(
        s"decontaminate: unknown strategy '$other' (broadcast | join | bloom)")
    }
  }

  /**
   * The audit face: WHICH benchmark items leaked into which corpus docs —
   * one row per (corpus, benchmark) pair of a CONTAMINATED doc, with the
   * pair's distinct shared-gram count. `minOverlap` applies at the DOC
   * level exactly like flag()/clean() (total distinct overlap against
   * the whole benchmark union), so the audit names at least one
   * benchmark item for every document the clean face drops — a per-pair
   * threshold would silently hide cross-benchmark contamination (1 gram
   * from item A + 1 from item B at min_overlap=2). Only the posting-join
   * shape can produce pairs (the broadcast probe collapses benchmark
   * identity): ids-only explode + gram join, text never crosses the
   * wire, and the pair table is bounded by real overlap.
   *
   * Stop-gram guard: the pair join is the one place in the family where
   * a hyper-common n-gram (a boilerplate phrase in C corpus docs and B
   * benchmark items) materializes C×B intermediate rows. `maxDf` caps
   * the corpus-side document frequency exactly like
   * Dedup.ngramJaccardPairs — capped grams are excluded from the
   * per-pair `n_shared` counts, bounding the worst gram at maxDf×B.
   * The DOC-level contamination gate stays UNCAPPED (its join against
   * the distinct benchmark grams is linear in the corpus postings), so
   * WHO is contaminated always agrees exactly with flag()/clean(); a
   * doc contaminated only via capped stop grams still surfaces in the
   * audit, with null bench_id/n_shared — that null row IS the loud
   * signal that the cap fired; [[cappedGrams]] names the grams.
   *
   * Laziness contract: this returns a plan, runs no Spark jobs, and
   * persists nothing corpus-sized. The cap lives inside the plan (a
   * left-anti join against the df-census grams whose df exceeds the
   * cap — a vocabulary-sized, usually EMPTY table, the only persisted
   * intermediate). The corpus posting explode is deliberately NOT
   * persisted: it is a narrow map over the scan consumed twice (pair
   * join + doc gate), and at the TB corpus scale this operator targets,
   * re-scanning twice beats materializing the full posting list.
   */
  def pairs(corpus: DataFrame, bench: DataFrame,
            textCol: String = "text", idCol: String = "doc_id",
            benchIdCol: String = "doc_id",
            n: Int = 3, minOverlap: Int = 1,
            maxDf: Int = DefaultPairsMaxDf): DataFrame = {
    require(n >= 1, s"decontaminate: n must be >= 1, got $n")
    require(minOverlap >= 1,
      s"decontaminate: min_overlap must be >= 1, got $minOverlap")
    require(maxDf >= 1, s"decontaminate: max_df must be >= 1, got $maxDf")
    // lazy postings: a narrow map over the corpus scan, consumed twice
    // (pair join + doc gate) and NOT persisted — see the scaladoc's
    // laziness contract
    val cg = corpus.select(col(idCol).as("corpus_id"),
      explode(grams(col(textCol), n)).as("g"))
    val bg = bench.select(col(benchIdCol).as("bench_id"),
      explode(grams(col(textCol), n)).as("g"))
    // the stop-gram cap stays inside the plan: the df census (map-side
    // combine collapses postings to the vocabulary before the shuffle,
    // so the census itself cannot blow up on a hot gram) yields the
    // OVER-cap grams — usually empty, at worst the stop-phrase tail —
    // and an anti-join (AQE broadcasts the tiny build side) excludes
    // them from the pair join. Persisting only this capped set keeps
    // the operator job-free at graph build and corpus-size-free in cache.
    val cappedG = OpCaches.persist(
      cg.groupBy(col("g")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDf).select(col("g")))
    val pairCounts = cg.join(cappedG, Seq("g"), "left_anti").join(bg, "g")
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
    // doc-level gate: same distinct-union intersection flag() counts —
    // uncapped, so the audit's doc set is exactly clean()'s drop set
    val contaminated = cg.join(bg.select(col("g")).distinct(), "g")
      .groupBy(col("corpus_id")).agg(count(lit(1)).as("__total"))
      .filter(col("__total") >= minOverlap)
      .select(col("corpus_id"))
    // LEFT from the gate side: capped-only contaminated docs keep a row
    contaminated.join(pairCounts, Seq("corpus_id"), "left")
  }

  /** Diagnostic for the pairs() stop-gram cap: the corpus n-grams whose
    * document frequency exceeds `maxDf` — i.e. exactly the grams a
    * pairs() audit at the same (n, maxDf) excludes from its per-pair
    * n_shared counts — with their df. Lazy; one census aggregation when
    * consumed. Run it when the audit surfaces null-bench_id rows to
    * name the boilerplate phrases behind them. */
  def cappedGrams(corpus: DataFrame, textCol: String = "text",
                  n: Int = 3, maxDf: Int = DefaultPairsMaxDf): DataFrame = {
    require(n >= 1, s"decontaminate: n must be >= 1, got $n")
    require(maxDf >= 1, s"decontaminate: max_df must be >= 1, got $maxDf")
    corpus.select(explode(grams(col(textCol), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
  }

  /** flag() then keep only the clean rows, dropping the audit columns —
    * the shape a training pipeline feeds downstream. */
  def clean(corpus: DataFrame, bench: DataFrame,
            textCol: String = "text", idCol: String = "doc_id",
            n: Int = 3, minOverlap: Int = 1,
            strategy: String = "broadcast"): DataFrame =
    flag(corpus, bench, textCol, idCol, n, minOverlap, strategy)
      .filter(!col("contaminated")).drop("n_hits", "contaminated")

  private def flagBroadcast(corpus: DataFrame, bench: DataFrame,
                            textCol: String, n: Int,
                            minOverlap: Int): DataFrame = {
    // Bounded driver materialization, justified like KMeans' centroid
    // collect: the benchmark side is eval data (small by construction)
    // and the cap fails loudly instead of OOMing the driver. limit+1
    // detects overflow without counting the full set.
    val rows = bench
      .select(explode(grams(col(textCol), n)).as("g")).distinct()
      .limit(MaxBroadcastGrams + 1).collect()
    require(rows.length <= MaxBroadcastGrams,
      s"decontaminate: benchmark n-gram set exceeds $MaxBroadcastGrams " +
        "distinct grams — use strategy=join for a benchmark this large")
    val set = rows.map(_.getString(0)).toSeq
    val hits =
      if (set.isEmpty) lit(0L)
      else coalesce(
        graft.functions.CountInSet.count(grams(col(textCol), n), set)
          .cast("long"),
        lit(0L)) // null text → grams null → count null → 0 hits
    corpus
      .withColumn("n_hits", hits)
      .withColumn("contaminated", col("n_hits") >= minOverlap)
  }

  /** Default false-positive rate for the bloom prefilter: FPR only
    * inflates the CANDIDATE set (each false positive pays one doc's
    * exact join), never the results — 1% is the standard cheapness/
    * candidate-bloat tradeoff. */
  val BloomFpp = 0.01

  private def flagBloom(corpus: DataFrame, bench: DataFrame,
                        textCol: String, idCol: String, n: Int,
                        minOverlap: Int): DataFrame = {
    // three consumers of the benchmark gram set (count sizes the filter,
    // the bloom build aggregates it, the exact hits join probes it) —
    // persist so the distinct explode is computed once, per the
    // operator-internal cache discipline of the dedup family
    val bg = OpCaches.persist(
      bench.select(explode(grams(col(textCol), n)).as("g")).distinct())
    val m = bg.count()
    if (m == 0)
      return corpus.withColumn("n_hits", lit(0L))
        .withColumn("contaminated", lit(false))
    val bloom = bg.stat.bloomFilter("g", m, BloomFpp)
    // candidate = any gram MIGHT be in the benchmark. Zero bloom hits
    // proves zero true hits (no false negatives) → exactly clean with
    // n_hits 0, no join. Null text → null grams → null count → 0.
    val cand = corpus.withColumn("__decon_cand",
      coalesce(
        graft.functions.CountInBloom.count(grams(col(textCol), n), bloom),
        lit(0)) >= 1)
    // exact distinct-intersection count, but ONLY candidate docs explode
    val hits = cand.filter(col("__decon_cand"))
      .select(col(idCol).as("__decon_id"), explode(grams(col(textCol), n)).as("g"))
      .join(bg, "g")
      .groupBy(col("__decon_id")).agg(count(lit(1)).as("__decon_hits"))
    cand
      .join(hits, cand(idCol) === hits("__decon_id"), "left")
      .drop("__decon_id", "__decon_cand")
      .withColumn("n_hits", coalesce(col("__decon_hits"), lit(0L)))
      .drop("__decon_hits")
      .withColumn("contaminated", col("n_hits") >= minOverlap)
  }

  private def flagJoin(corpus: DataFrame, bench: DataFrame,
                       textCol: String, idCol: String, n: Int,
                       minOverlap: Int): DataFrame = {
    val bg = bench.select(explode(grams(col(textCol), n)).as("g")).distinct()
    // ids-only explode: the corpus text column never crosses the wire.
    // WordShingles is already distinct per doc and bg is distinct, so
    // count(*) per id IS the distinct-intersection size.
    val hits = corpus
      .select(col(idCol).as("__decon_id"), explode(grams(col(textCol), n)).as("g"))
      .join(bg, "g")
      .groupBy(col("__decon_id")).agg(count(lit(1)).as("__decon_hits"))
    // The hit table is at most one row per contaminated doc — typically
    // a small fraction of the corpus, so AQE broadcasts this join-back.
    corpus
      .join(hits, corpus(idCol) === hits("__decon_id"), "left")
      .drop("__decon_id")
      .withColumn("n_hits", coalesce(col("__decon_hits"), lit(0L)))
      .drop("__decon_hits")
      .withColumn("contaminated", col("n_hits") >= minOverlap)
  }
}
