package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only: stage timing mirroring minhashNearDups' actual plan. */
object MinhashProbe {
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
    val wide = docs.repartition(32)
    val sigsHof = wide.select(col("doc_id").as("id"),
      Dedup.minhashSignature(Dedup.wordShingles(col("text"), 3), 32).as("sig"))
    t("sigs OLD interpreted fold") { sigsHof.select(sum(pmod(element_at(col("sig"), 1), lit(1000)))).head(); 5000L }
    val sigs = Dedup.minhashSignatures(wide, "text", "doc_id", 3, 32).persist()
    t("sigs NEW relational")(sigs.count())
    t("sigs NEW rerun (cached)")(sigs.count())
    val buckets = sigs
      .select(col("id"), explode(Dedup.lshBucketKeys(col("sig"), 32, 16)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val cand = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    t("candidates (cached sigs)")(cand.count())
    val pre = cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .filter(Dedup.signatureAgreement(col("sig_a"), col("sig_b"), 32) >= 0.1)
      .select(col("id_a"), col("id_b"))
    t("prefilter (cached sigs)")(pre.count())
    val texts = wide.select(col("doc_id").as("id"), col("text").as("t"))
    val ver = pre
      .join(texts.select(col("id").as("id_a"), col("t").as("ta")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("t").as("tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(Dedup.shingles(col("ta"), 5), Dedup.shingles(col("tb"), 5)).as("j"))
      .filter(col("j") >= 0.6)
    t("verify (char shingles)")(ver.count())
    // embedding operator mirror at r=10
    val emb = table(spark, dir, "embeddings")
    val ebase = emb.repartition(32).select(col("vec_id").as("id"), col("embedding").as("v"))
    val ebuck = ebase.select(col("id"),
        explode(Similarity.lshCosineBands(col("v"), 64, 16, 10)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("sig")).persist()
    t("e: bucketed materialize")(ebuck.count())
    val ecand = ebuck.select(col("band"), col("sig"), col("id").as("id_a"))
      .join(ebuck.select(col("band"), col("sig"), col("id").as("id_b")), Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    t("e: candidates")(ecand.count())
    val ever = ecand
      .join(ebase.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(ebase.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), Similarity.cosine(col("va"), col("vb")).as("c"))
      .filter(col("c") >= 0.95)
    t("e: verify")(ever.count())
    t("e: full query shape")(Similarity.embeddingNearDups(emb, "embedding", "vec_id", 0.95, 64, 16, 10).count())
    spark.stop()
  }
}
