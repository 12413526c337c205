package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale.Dedup

/** Dev-only: isolates the cost of Dedup.exactKey's whitespace-collapse
  * regex (regexp_replace(lower(trim(text)), "\s+", " ")) — the
  * normalization EVERY dedup path runs corpus-wide — against the
  * regex-free floor (md5(lower(trim(text))) — no collapse) to bound
  * what a char-loop collapse kernel could save. Run:
  *   sbt "runMain graft.tools.KeyProbe /root/testdata/sf0.1 1 10 100"
  */
object KeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      val docs = CurationProbe.replicateDocs(table(spark, dir, "documents"), fac)
        .repartition(32).persist()
      docs.count()
      t(s"exactKey md5 (kernel) ${fac}x") {
        docs.select(md5(Dedup.exactKey(col("text")).cast("binary")).as("k"))
          .agg(count(col("k"))).head().getLong(0)
      }
      t(s"exactKey md5 (regex collapse) ${fac}x") {
        docs.select(md5(Dedup.exactKeyRegex(col("text")).cast("binary")).as("k"))
          .agg(count(col("k"))).head().getLong(0)
      }
      t(s"floor md5(lower(trim)) ${fac}x") {
        docs.select(md5(lower(trim(col("text"))).cast("binary")).as("k"))
          .agg(count(col("k"))).head().getLong(0)
      }
      t(s"tokenCount kernel ${fac}x") {
        docs.select(graft.scale.TextAnalysis.tokenCount(col("text")).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      t(s"tokenCount split ${fac}x") {
        docs.select(graft.scale.TextAnalysis.tokenCountSplit(col("text")).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      t(s"meanWordLen kernel ${fac}x") {
        docs.select(graft.scale.TextAnalysis.meanWordLen(col("text")).as("m"))
          .agg(sum(col("m")).cast("long")).head().getLong(0)
      }
      t(s"meanWordLen replace+split ${fac}x") {
        docs.select(graft.scale.TextAnalysis.meanWordLenSplit(col("text")).as("m"))
          .agg(sum(col("m")).cast("long")).head().getLong(0)
      }
      t(s"stopwordRatio kernel ${fac}x") {
        docs.select(graft.scale.TextAnalysis.stopwordRatio(col("text")).as("r"))
          .agg(sum(col("r")).cast("long")).head().getLong(0)
      }
      t(s"stopwordRatio split ${fac}x") {
        docs.select(graft.scale.TextAnalysis.stopwordRatioSplit(col("text")).as("r"))
          .agg(sum(col("r")).cast("long")).head().getLong(0)
      }
      t(s"gopher stopHits kernel ${fac}x") {
        docs.select(graft.functions.CountTokensInSet.countDistinct(
          col("text"), graft.scale.TextAnalysis.GopherStopwords).as("h"))
          .agg(sum(col("h"))).head().getLong(0)
      }
      t(s"gopher stopHits split ${fac}x") {
        val low = split(lower(trim(col("text"))), "\\s+")
        docs.select(graft.scale.TextAnalysis.GopherStopwords.map(w =>
          array_contains(low, w).cast("int")).reduce(_ + _).as("h"))
          .agg(sum(col("h"))).head().getLong(0)
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
