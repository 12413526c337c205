package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only: stage timing for the banded-LSH embedding near-dup path.
  * The bucketing-variant shoot-out this probe ran (HOF vs unrolled
  * codegen vs relational groupBy) is recorded in lshCosineBands's
  * scaladoc; the HOF form won and is the one that remains. */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val emb = table(spark, dir, "embeddings")
    val base = emb.repartition(32).select(col("vec_id").as("id"), col("embedding").as("v"))
    t("base count")(base.count())
    def buckets() = base.select(col("id"),
      explode(Similarity.lshCosineBands(col("v"), 64, 16, 10)).as("bk"))
    t("buckets per-plane (cold)")(buckets().count())
    t("buckets per-plane (rerun)")(buckets().count())
    def matrixBuckets() = base
      .select(col("id"), Similarity.planeSums(col("v"), 64, 160).as("ps"))
      .select(col("id"), explode(Similarity.bandKeysFromSums(col("ps"), 16, 10)).as("bk"))
    t("buckets matrix (cold)")(matrixBuckets().count())
    t("buckets matrix (rerun)")(matrixBuckets().count())
    // signatures must be bit-identical between the two forms
    t("signature mismatch count")(
      buckets().select(col("id"), col("bk"))
        .exceptAll(matrixBuckets().select(col("id"), col("bk"))).count())
    // marginal per-row cost: the same plan over 64x the rows isolates
    // per-row cost from fixed optimize/codegen overhead
    val big = (0 until 64).map(_ => base).reduce(_ union _).repartition(32).persist()
    t("big count")(big.count())
    def bigBuckets() = big.select(col("id"),
      explode(Similarity.lshCosineBands(col("v"), 64, 16, 10)).as("bk"))
    t("buckets 128k (cold)")(bigBuckets().count())
    t("buckets 128k (rerun)")(bigBuckets().count())
    big.unpersist()
    t("full embeddingNearDups")(
      Similarity.embeddingNearDups(emb, "embedding", "vec_id", 0.95, 64, 16, 10).count())
    OpCaches.drain()
    t("full rerun")(
      Similarity.embeddingNearDups(emb, "embedding", "vec_id", 0.95, 64, 16, 10).count())
    OpCaches.drain()
    def entryQuery(): Long = {
      val e = table(spark, dir, "embeddings")
      val losers = Similarity.embeddingNearDups(e, "embedding", "vec_id", 0.95, 64, 16, 10)
        .select(col("id_b").as("vec_id")).distinct()
      e.join(losers, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label")).orderBy(col("vec_id")).count()
    }
    spark.catalog.clearCache()
    t("SparkEntry query (cache-cleared)")(entryQuery())
    spark.catalog.clearCache()
    t("SparkEntry query rerun")(entryQuery())
    spark.stop()
  }
}
