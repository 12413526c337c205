package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._
import graft.ops.RelationalOps

/** Dev-only: scaling-shape evidence for the curation operators (chunk,
  * text_normalize, url_features, outlier_filter, pack_units, group_cap).
  * Replicates the sf documents table Nx under fresh ids (text salted per
  * replica so normalize/chunk see distinct bytes) and compares wall time
  * at 1x vs Nx. The narrow maps should scale ~linearly in rows; the
  * windowed ops (pack_units, group_cap) add one exchange whose cost is
  * the in-partition sort. Run:
  *   sbt "runMain graft.tools.CurationProbe /root/testdata/sf0.1 1 10 100"
  * (the first factor is a discarded JIT warm-up pass).
  *
  * Measured (local[32], sf0.1 docs = 5k rows replicated; warm 10x vs
  * 100x, i.e. 50k vs 500k docs, 2026-08-14, with the CharChunks and
  * positional-WordShingles codegen kernels):
  *   chunk(200,50)        0.25 s → 0.46 s   (1.8x time for 10x rows)
  *   text_normalize(all)  0.49 s → 1.08 s   (2.2x)
  *   url_features         0.23 s → 0.95 s   (4.1x — regex-bound, linear)
  *   outlier_filter       0.66 s → 1.00 s   (1.5x)
  *   pack_units           0.55 s → 1.07 s   (1.9x)
  *   group_cap            0.49 s → 0.64 s   (1.3x)
  *   char_entropy         0.16 s → 0.26 s   (1.6x — ~8M docs/s kernel)
  *   dedup_against        0.76 s → 1.01 s   (1.3x — broadcast anti-join)
  *   sample_weighted      0.22 s → 0.52 s   (2.4x)
  *   line_dedup join      1.51 s → 2.13 s   (1.4x; 5.83 s at 100x —
  *     3.9x for 100x rows. 4-line docs, 51-line hot set at every
  *     factor: the census scales, the hot set does not.)
  *   line_dedup set       0.78 s → 1.47 s   (1.9x; 4.91 s at 100x —
  *     the eager census + narrow rewrite beats the join strategy's
  *     regroup+join-back at every factor.)
  *   top_grams(n=2,k=40)  0.77 s → 1.80 s   (2.3x; 135M bigrams at
  *     100x — ~75M grams/s since the positional-WordShingles kernel,
  *     7.6x over the interpreted HOF chain it replaced. Still linear
  *     in gram positions by nature; topGrams documents the 100 TB
  *     practice of sampling for vocabulary stats.)
  *   gopher_rules         0.31 s at 10x, 0.79 s at 100x with the
  *     r18 kernels (CountAlphaTokens + the shared TokenStats pass +
  *     CountTokensInSet stopHits; no split arrays left) — the same
  *     projection measured 3.43 s at 100x pre-kernels, a 4.3x win
  *     on the corpus-wide quality pass. r19: the five remaining
  *     line/symbol scans (hash strip, ellipsis count, split-\n,
  *     two (?dm) counts) collapsed into one GopherLineStats pass —
  *     0.81 s cold / 0.49 s warm at 100x (LineRuleProbe isolates
  *     the five scans at 0.94-1.40 s vs the kernel's 0.32-0.57 s);
  *     no regex left anywhere in the gopher projection.
  *   alpha_count (100x, 27.6M tokens): char-loop kernel 0.23 s,
  *     interpreted ArrayFilter lambda 0.41 s, compiled regexp_count
  *     0.60 s — the codegen'd regex LOST to the interpreted lambda;
  *     the kernel's win is dropping the regex engine, not codegen.
  *   l2_normalize (100x, 200k 64-dim vectors): one-pass kernel
  *     0.23 s vs composed sqrt(ArrayDot)+transform 0.56 s (2.4x).
  * Everything ≤ 4x for 10x input — fixed per-job overhead still
  * dominates at this scale; nothing is super-linear, consistent with
  * the narrow-map / single-exchange plan shapes the specs pin.
  */
object CurationProbe {

  def replicateDocs(docs1: org.apache.spark.sql.DataFrame,
                    factor: Int): org.apache.spark.sql.DataFrame =
    (0 until factor).map { i =>
      docs1.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" r$i")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // factors as trailing args; repeat one (e.g. "1 1 10 100") to absorb
    // JIT/codegen warm-up into a discarded first pass
    val factors =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(1, 1, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-34s n=$n%-10d $dt%.2f s")
      dt
    }

    for (fac <- factors) {
      println(s"--- factor ${fac}x ---")
      val docs = replicateDocs(table(spark, dir, "documents"), fac)
        .repartition(32).persist()
      docs.count()
      val urled = docs.withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.org/d/"),
          col("doc_id").cast("string")))
      t(s"chunk(200,50) ${fac}x") {
        TextAnalysis.chunk(docs, "text", 200, 50)
          .agg(sum(length(col("chunk_text")))).head().getLong(0)
      }
      t(s"text_normalize(all) ${fac}x") {
        TextAnalysis.normalizeText(docs, "text", accentFold = true,
          stripPunct = true)
          .agg(sum(length(col("text")))).head().getLong(0)
      }
      t(s"url_features ${fac}x") {
        TextAnalysis.urlFeatures(urled, "url")
          .agg(count(col("url_domain"))).head().getLong(0)
      }
      t(s"outlier_filter zscore(n_chars) ${fac}x") {
        Profile.outlierFilter(docs, "n_chars", "zscore", 3.0, Seq("source"))
          .agg(sum(col("n_chars"))).head().getLong(0)
      }
      t(s"pack_units(5000, by lang) ${fac}x") {
        RelationalOps.packUnits(docs, "doc_id", "n_chars", 5000L, Seq("lang"))
          .agg(max(col("unit_id"))).head().getLong(0)
      }
      t(s"group_cap(100, by source) ${fac}x") {
        RelationalOps.groupCap(docs, "doc_id", 100, Seq("source"))
          .agg(count(lit(1))).head().getLong(0)
      }
      t(s"char_entropy ${fac}x") {
        docs.select(TextAnalysis.charEntropy(col("text")).as("h"))
          .agg(sum(col("h")).cast("long")).head().getLong(0)
      }
      t(s"dedup_against(1x ref) ${fac}x") {
        // reference = one replica's worth of keys: every replica's rows
        // carry a distinct salt, so survivors = (fac-1)/fac of the corpus
        Dedup.exactAgainst(docs,
          docs.limit(5000).select(col("text")), "text")
          .agg(count(lit(1))).head().getLong(0)
      }
      t(s"top_grams(n=2, k=40) ${fac}x") {
        TextAnalysis.topGrams(docs, "text", 40, 2)
          .agg(sum(col("n_occurrences"))).head().getLong(0)
      }
      t(s"sample_weighted ${fac}x") {
        RelationalOps.hashSampleWeighted(
          docs.withColumn("rate", col("n_chars") / lit(1000.0)),
          "doc_id", "rate")
          .agg(count(lit(1))).head().getLong(0)
      }
      // the fixture text is single-line; synthesize the line structure
      // line_dedup exists for: per-doc salted prose (2 unique lines)
      // plus a global footer and one of 50 nav variants (51 hot lines
      // at every factor — the census scales, the hot set does not)
      val lined = docs.withColumn("text",
        concat_ws("\n", col("text"),
          lit("Subscribe to our newsletter"),
          concat(lit("Nav item "), (col("doc_id") % 50).cast("string")),
          concat(col("text"), lit(" tail"))))
      t(s"line_dedup join ${fac}x") {
        Dedup.lineDedup(lined, "text", "doc_id")
          .agg(sum(length(col("text")))).head().getLong(0)
      }
      t(s"line_dedup set ${fac}x") {
        Dedup.lineDedupSet(lined, "text", "doc_id")
          .agg(sum(length(col("text")))).head().getLong(0)
      }
      t(s"gopher_rules ${fac}x") {
        TextAnalysis.gopherRules(docs)
          .agg(sum(col("gopher_pass").cast("long"))).head().getLong(0)
      }
      // the r18 alpha-word kernelization, isolated, all three
      // formulations (identical counts, spec-pinned): the char-loop
      // kernel vs the compiled-but-regex-bound regexp_count single
      // pass vs the interpreted per-token ArrayFilter lambda. The
      // regexp surprise is why all three stay measured: codegen'd
      // regexp_count LOST to the interpreted lambda (regex cost >
      // dispatch cost); only dropping the regex engine wins.
      t(s"alpha_count kernel ${fac}x") {
        docs.select(graft.functions.CountAlphaTokens.count(col("text")).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      t(s"alpha_count regexp ${fac}x") {
        docs.select(regexp_count(col("text"), lit("\\S*\\p{L}\\S*")).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      t(s"alpha_count HOF filter ${fac}x") {
        docs.select(size(filter(split(trim(col("text")), "\\s+"),
          x => x.rlike("\\p{L}"))).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      docs.unpersist()

      // embedding normalize: the r18 one-pass kernel vs the composed
      // sqrt(ArrayDot) + interpreted transform divide it replaced. The
      // aggregate touches BOTH outputs (norm and a unit element) so
      // column pruning cannot delete the divide half of the work.
      val emb = (0 until fac).map { i =>
        table(spark, dir, "embeddings")
          .select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding"))
      }.reduce(_ union _).repartition(32).persist()
      emb.count()
      def normAgg(d: org.apache.spark.sql.DataFrame): Long =
        d.agg((sum(col("vec_norm")) +
          sum(element_at(col("vec_unit"), 1))).cast("long"))
          .head().getLong(0)
      t(s"l2_normalize kernel ${fac}x") {
        normAgg(Similarity.l2NormalizeVectors(emb, "embedding"))
      }
      t(s"l2_normalize composed ${fac}x") {
        normAgg(Similarity.l2NormalizeVectorsHof(emb, "embedding"))
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
