package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only: stage timing for the relational banded-LSH embedding path. */
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
    val proj = Similarity.projections(base, 64, 16, 10)
    t("projections (cold)")(proj.count())
    t("projections (rerun)")(proj.count())
    t("full embeddingNearDups")(
      Similarity.embeddingNearDups(emb, "embedding", "vec_id", 0.95, 64, 16, 10).count())
    t("full rerun")(
      Similarity.embeddingNearDups(emb, "embedding", "vec_id", 0.95, 64, 16, 10).count())
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
