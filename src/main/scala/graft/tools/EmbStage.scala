package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only: decompose the dedup_embedding query into cumulative stage
  * prefixes, under the SAME session config as Bench, so the ~7 s residual
  * (VERDICT r4) can be attributed to a specific stage instead of guessed.
  * Each prefix is timed cache-cleared (like a bench rep) and then warm.
  */
object EmbStage {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); OpCaches.drain()
      val t0 = System.nanoTime()
      val n = f
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n2 = f
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"$name%-36s n=$n%-8d cold=$cold%6.2f s  warm=$warm%6.2f s  (n2=$n2)")
    }

    val emb = table(spark, dir, "embeddings")
    val (dim, bands, r) = (64, 16, 10)

    // stage prefixes, mirroring Similarity.embeddingNearDups
    t("1 read count")(emb.count())
    def widen(df: DataFrame): DataFrame = { // private[scale] Dedup.widen, inlined
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
    t("2 widen (rdd.partitions + repart)")(widen(emb).count())
    def base = widen(emb).select(col("vec_id").as("id"), col("embedding").as("v"))
    def bucketedRaw = base
      .select(col("id"), Similarity.planeSums(col("v"), dim, bands * r).as("ps"))
      .select(col("id"), explode(Similarity.bandKeysFromSums(col("ps"), bands, r)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    t("3 bucketed (no persist)")(bucketedRaw.count())
    t("4 bucketed persist+count")(OpCaches.persist(bucketedRaw).count())
    def candFrom(b: DataFrame) = b.select(col("band"), col("sig"), col("id").as("id_a"))
      .join(b.select(col("band"), col("sig"), col("id").as("id_b")), Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    t("5 cand (persisted bucketed)") {
      val b = OpCaches.persist(bucketedRaw); b.count(); candFrom(b).count()
    }
    t("5b cand (NO persist)")(candFrom(bucketedRaw).count())
    def withN = base.select(col("id"), col("v"), Similarity.dot(col("v"), col("v")).as("n2"))
    t("6 withN count")(withN.count())
    def nearDups() = {
      val b = OpCaches.persist(bucketedRaw)
      val cand = candFrom(b)
      val d = sqrt(col("na2")) * sqrt(col("nb2"))
      cand
        .join(withN.select(col("id").as("id_a"), col("v").as("va"), col("n2").as("na2")), Seq("id_a"))
        .join(withN.select(col("id").as("id_b"), col("v").as("vb"), col("n2").as("nb2")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          when(d === 0, lit(0.0)).otherwise(Similarity.dot(col("va"), col("vb")) / d).as("cos"))
        .filter(col("cos") >= 0.95)
    }
    t("7 nearDups full")(nearDups().count())
    t("8 losers distinct")(nearDups().select(col("id_b").as("vec_id")).distinct().count())
    t("9 full entry query") {
      val losers = Similarity.embeddingNearDups(emb, "embedding", "vec_id", 0.95, dim, bands, r)
        .select(col("id_b").as("vec_id")).distinct()
      emb.join(losers, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label")).orderBy(col("vec_id")).count()
    }
    spark.stop()
  }
}
