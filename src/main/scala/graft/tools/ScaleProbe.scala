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
    val embN = (0 until factor).map { i =>
      // per-replica CYCLIC SHIFT: an isometry, so each replica keeps the
      // original's internal near-dup structure while cross-replica
      // cosines stay unstructured (an additive constant would instead
      // collapse every vector toward the all-ones direction and
      // manufacture a quadratic near-dup clique)
      val shifted =
        if (i == 0) col("embedding")
        else concat(slice(col("embedding"), i + 1, 64 - i),
          slice(col("embedding"), 1, i))
      emb1.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        shifted.as("embedding"), col("label"))
    }.reduce(_ union _).repartition(32).persist()
    embN.count()

    def ratio(name: String, one: => Long, many: => Long): Unit = {
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
    ratio("embeddingNearDups",
      Similarity.embeddingNearDups(emb1, "embedding", "vec_id", 0.95, 64, 16, 10).count(),
      Similarity.embeddingNearDups(embN, "embedding", "vec_id", 0.95, 64, 16, 10).count())

    println(s"docs: $nDocs -> ${nDocs * factor}")
    spark.stop()
  }
}
