package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only stage timing probe for the pairwise dedup operators. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = table(spark, dir, "documents")
    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.minhashSignature(Dedup.wordShingles(col("text"), 3), 32).as("sig"))
    t("word sig force") { sigs.select(sum(pmod(element_at(col("sig"), 1), lit(1000)))).head(); 5000L }
    val buckets = sigs
      .select(col("id"), explode(Dedup.lshBucketKeys(col("sig"), 32, 16)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    t("buckets")(buckets.count())
    val cand = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    t("candidate pairs")(cand.count())
    val pre = cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .filter(Dedup.signatureAgreement(col("sig_a"), col("sig_b"), 32) >= 0.1)
      .select(col("id_a"), col("id_b"))
    t("prefiltered pairs")(pre.count())
    t("full minhashNearDups")(
      Dedup.minhashNearDups(docs, "text", "doc_id", 5, 32, 16, 0.6).count())
    // simhash stages
    val withFp = docs.select(col("doc_id").as("id"), Dedup.simhashBlocks(col("text")).as("blk"))
    t("simhash fp force") { withFp.select(sum(pmod(element_at(col("blk"), 1), lit(1000)))).head(); 5000L }
    val eS = withFp.select(col("id"), posexplode(col("blk")).as(Seq("pos", "v")))
    val candS = eS.select(col("pos"), col("v"), col("id").as("id_a"))
      .join(eS.select(col("pos"), col("v"), col("id").as("id_b")), Seq("pos", "v"))
      .filter(col("id_a") < col("id_b"))
    t("simhash raw join rows")(candS.count())
    t("simhash distinct pairs")(candS.select(col("id_a"), col("id_b")).distinct().count())
    t("full simhashNearDups")(Dedup.simhashNearDups(docs, "text", "doc_id", 3).count())
    // embedding stages
    val emb = table(spark, dir, "embeddings")
    val bucketedE = emb.select(col("vec_id").as("id"),
      explode(Similarity.lshCosineBands(col("embedding"), 64, 16, 8)).as("bk"))
    t("embed sig force") { bucketedE.select(sum(pmod(col("bk.sig"), lit(1000)))).head(); 32000L }
    val candE = bucketedE.select(col("bk.band").as("band"), col("bk.sig").as("sig"), col("id").as("id_a"))
      .join(bucketedE.select(col("bk.band").as("band"), col("bk.sig").as("sig"), col("id").as("id_b")), Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
    t("embed raw join rows")(candE.count())
    t("full embeddingNearDups")(
      Similarity.embeddingNearDups(emb, "embedding", "vec_id", 0.95, 64).count())
    // ngram stages
    val shW = docs.select(col("doc_id").as("id"), Dedup.wordShingles(col("text"), 4).as("sh"))
    val postW = shW.select(col("id"), explode(col("sh")).as("g"))
    t("ngram postings")(postW.count())
    val cappedW = postW.join(postW.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 10000).select(col("g")), Seq("g"))
    t("ngram raw pair rows")(cappedW.select(col("g"), col("id").as("id_a"))
      .join(cappedW.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b")).count())
    t("full ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, "text", "doc_id", 4, 0.3).count())
    spark.stop()
  }
}
