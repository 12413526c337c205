package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only: phase attribution for one searchBucketed probe — where does
  * the per-query constant go (centroid top-nprobe job, index DataFrame
  * creation/listing, pruned scan+top-k)? Companion to IvfProbe. */
object IvfPhase {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
    val emb1 = table(spark, dir, "embeddings")
    val corpus = ScaleProbe.replicateEmb(emb1, factor).repartition(32).persist()
    val n = corpus.count()
    val kcells = Similarity.ivfCellsFor(n)
    val centroids = KMeans.train(corpus, "embedding", kcells, iters = 3)
    centroids.count()
    val idx = s"/tmp/ivfphase_idx"
    KMeans.indexBucketed(corpus, "embedding", "vec_id", centroids, idx)
    val vec = emb1.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0)
    val q = array(vec.map(v => lit(v)): _*)

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val cells = t("centroid top-nprobe collect") {
        centroids.select(col("cell"), Similarity.cosine(col("cvec"), q).as("csim"))
          .orderBy(col("csim").desc, col("cell").asc).limit(17)
          .collect().map(_.getAs[Number](0).intValue)
      }
      val df = t("ParquetIO.read (fingerprint+infer)") {
        graft.io.ParquetIO.read(spark, idx)
      }
      val pruned = t("filter+select plan build") {
        df.filter(col("cell").isin(cells.toIndexedSeq: _*))
          .select(col("vec_id"), round(Similarity.cosine(col("embedding"), q), 6).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
      }
      t("execute collect")(pruned.collect())
      val bare = t("bare spark.read.parquet")(spark.read.parquet(idx))
      t("fingerprint listing only") {
        val p = new org.apache.hadoop.fs.Path(idx)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val it = fs.listFiles(p, true)
        var n2 = 0
        while (it.hasNext) { it.next(); n2 += 1 }
        n2
      }
      t("schema-supplied read")(spark.read.schema(bare.schema).parquet(idx))
    }
    spark.stop()
  }
}
