package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only: scaling-shape evidence for the dedup/similarity family.
  * Replicates the sf0.1 tables Nx with unique ids and compares wall time
  * at 1x vs Nx. Text replicas carry a trailing salt token, which leaves
  * cross-replica copies as near-dups — so the TEXT experiments measure the
  * harder case where the output pair count grows ~N² while the input grows
  * N; a time ratio well under N under those conditions is strong evidence
  * the banded/blocked/posting shapes scale. Embedding replicas are
  * cyclically shifted (an isometry) so the pair structure stays constant
  * per replica and the measurement isolates input-size scaling. */
object ScaleProbe {

  /** Replicate the embeddings table `factor`x under fresh ids, each
    * replica a distinct isometry of the original (cyclic shift composed
    * with a sign flip every second 64-period): per-replica near-dup
    * structure is preserved while cross-replica cosines stay
    * unstructured. Shared by the dedup stages below and IvfProbe. */
  def replicateEmb(emb1: org.apache.spark.sql.DataFrame, factor: Int): org.apache.spark.sql.DataFrame = {
    // The replica isometry has combined period 128 — at factor > 128
    // replica i and i+128 are again identical vectors under fresh ids,
    // recreating the exact-dup clique; guard loudly.
    require(factor <= 128,
      s"embedding replication is an isometry only up to factor 128 (got $factor)")
    (0 until factor).map { i =>
      val s = i % 64
      val shifted =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, 64 - s),
          slice(col("embedding"), 1, s))
      val iso =
        if ((i / 64) % 2 == 0) shifted
        else transform(shifted, x => -x)
      emb1.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        iso.as("embedding"), col("label"))
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
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

    val docs1 = table(spark, dir, "documents").persist()
    val nDocs = docs1.count()
    val docsN = (0 until factor).map { i =>
      docs1.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        // salt replica text so replicas don't near-dup each other
        concat(col("text"), lit(s" replica-salt-$i-" + "x" * (i % 5))).as("text"))
    }.reduce(_ union _).repartition(32).persist()
    docsN.count()

    val emb1 = table(spark, dir, "embeddings").persist()
    emb1.count()
    // per-replica CYCLIC SHIFT composed with a SIGN FLIP on every second
    // 64-replica period: both are isometries, so each replica keeps the
    // original's internal near-dup structure while cross-replica cosines
    // stay unstructured (an additive constant would instead collapse
    // every vector toward the all-ones direction and manufacture a
    // quadratic near-dup clique). The shift alone has period 64 — at
    // factor > 64 replica i and i+64 would be IDENTICAL vectors under
    // fresh ids (an artificial exact-dup clique, and slice(…, 64-i)
    // throws on a negative length); the alternating negation makes the
    // period-64 twin the antipode (cosine −1), which no near-dup
    // threshold matches (combined period 128 — guarded in replicateEmb).
    val embN = replicateEmb(emb1, factor).repartition(32).persist()
    embN.count()

    // args(2..): stage-name filter — at high factors a single stage can
    // take minutes and spill tens of GB, so stages must be runnable one at
    // a time with a disk cleanup between (the 100x simhash/ngram probes
    // are disk-bound on this box, not compute-bound)
    val only = args.drop(2).toSet
    def ratio(name: String, one: => Long, many: => Long): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      val t1 = t(s"$name 1x")(one)
      OpCaches.drain(); spark.catalog.clearCache()
      docs1.persist().count(); docsN.persist().count()
      emb1.persist().count(); embN.persist().count()
      val tN = t(s"$name ${factor}x")(many)
      OpCaches.drain()
      println(f"  -> ${factor}x data cost ${tN / t1}%.1fx the time (linear = <= ~$factor.0x)")
    }

    ratio("minhashNearDups",
      Dedup.minhashNearDups(docs1.select(col("doc_id"), col("text")), "text", "doc_id").count(),
      Dedup.minhashNearDups(docsN, "text", "doc_id").count())
    ratio("simhashDedup",
      Dedup.simhashDedup(docs1.select(col("doc_id"), col("text")), "text", "doc_id").count(),
      Dedup.simhashDedup(docsN, "text", "doc_id").count())
    ratio("ngramJaccardPairs",
      Dedup.ngramJaccardPairs(docs1.select(col("doc_id"), col("text")), "text", "doc_id", n = 4, threshold = 0.3).count(),
      Dedup.ngramJaccardPairs(docsN, "text", "doc_id", n = 4, threshold = 0.3).count())
    // LSH depth follows the operator's own scaling rule (embeddingNearDups
    // scaladoc: grow r ~ log2(n), bands from the recall budget). Running
    // 200k vectors at the 2k-vector parameters (16x10) is the documented
    // anti-pattern: background collisions C(n,2)*bands*2^-r go quadratic
    // (~60 GB of shuffle spill at 100x on this box). Per-scale parameters
    // keep candidates ~linear; recall at cos>=0.95 is held ~99% by solving
    // bands = ln(miss)/ln(1 - p^r), p = 1 - acos(0.95)/pi.
    val nVecs1 = emb1.count()
    val (b1, r1) = Similarity.lshDepthFor(nVecs1, 0.95)
    val (bN, rN) = Similarity.lshDepthFor(nVecs1 * factor, 0.95)
    println(s"embedding LSH params: 1x bands=$b1 r=$r1, ${factor}x bands=$bN r=$rN")
    ratio("embeddingNearDups",
      Similarity.embeddingNearDups(emb1, "embedding", "vec_id", 0.95, 64, b1, r1).count(),
      Similarity.embeddingNearDups(embN, "embedding", "vec_id", 0.95, 64, bN, rN).count())

    // connectedComponents: salted replica CHAINS (length 512 → ~9-10
    // pointer-jump rounds, well past the near-clique 2-3) so the probe
    // measures multi-round behavior. 1x = 1M vertices; factor scales the
    // vertex/edge count at constant chain length, isolating per-round
    // cost scaling from round-count scaling. Reports per-round step
    // (label update + eager checkpoint) vs check (changed-count action)
    // seconds — the data behind the checkEvery default.
    if (only.isEmpty || only.contains("connectedComponents")) {
      def ccStage(v: Long, tag: String): Unit = {
        val chainLen = 512L
        val edges = spark.range(v).toDF("id_a")
          // two exclusions: chain boundaries, and the final vertex when v
          // is not a chainLen multiple (else id_b = v escapes the range)
          .filter((col("id_a") + 1) % chainLen =!= 0 && col("id_a") + 1 < v)
          .select(col("id_a"), (col("id_a") + 1).as("id_b"))
          .repartition(32)
        val rounds = scala.collection.mutable.ArrayBuffer[(Int, Double, Double, Long)]()
        val t0 = System.nanoTime()
        val n = Dedup.ccProbed(edges, "id_a", "id_b", 25, 1,
          (r, st, ct, ch) => rounds += ((r, st, ct, ch))).count()
        val total = (System.nanoTime() - t0) / 1e9
        val stepSum = rounds.map(_._2).sum
        val checkSum = rounds.map(_._3).sum
        println(f"cc $tag%-6s v=$v%-10d labeled=$n%-10d rounds=${rounds.size} " +
          f"total=$total%.2f s step=$stepSum%.2f s check=$checkSum%.2f s " +
          f"(check share ${100 * checkSum / (stepSum + checkSum)}%.0f%%)")
        rounds.foreach { case (r, st, ct, ch) =>
          println(f"    round $r%2d step=$st%6.2f s check=$ct%6.2f s changed=$ch") }
        OpCaches.drain(); spark.catalog.clearCache()
      }
      ccStage(1000000L, "1x")
      ccStage(1000000L * factor, s"${factor}x")
    }

    println(s"docs: $nDocs -> ${nDocs * factor}")
    spark.stop()
  }
}
