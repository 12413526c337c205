package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only microbenchmark of the shingling expression pipeline. */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = table(spark, dir, "documents").cache()
    docs.count()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n)")
    }
    val text = col("text")
    val norm = Dedup.exactKey(text)
    t("exactKey only")(docs.select(sum(length(norm))).head().get(0))
    val toks = split(norm, " ")
    t("split")(docs.select(sum(size(toks))).head().get(0))
    t("split+distinct")(docs.select(sum(size(array_distinct(toks)))).head().get(0))
    val count3 = greatest(size(toks) - 2, lit(1))
    val sling = transform(sequence(lit(0), count3 - 1),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(3))))
    t("shingle no-distinct")(docs.select(sum(size(sling))).head().get(0))
    t("wordShingles full")(docs.select(sum(size(Dedup.wordShingles(text, 3)))).head().get(0))
    // variant: substring-based trigram via element_at
    val sling2 = transform(sequence(lit(0), count3 - 1),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))
    t("shingle element_at")(docs.select(sum(size(array_distinct(sling2)))).head().get(0))
    // char shingles
    t("charShingles 5")(docs.select(sum(size(Dedup.shingles(text, 5)))).head().get(0))
    val idxs = sequence(lit(1), greatest(length(norm) - 4, lit(1)))
    t("char no-distinct")(docs.select(sum(size(transform(idxs, i => norm.substr(i, lit(5)))))).head().get(0))
    // signature over word shingles
    t("sig one-pass agg")(docs.select(sum(pmod(element_at(
      Dedup.minhashSignature(Dedup.wordShingles(text, 3), 32), 1), lit(1000)))).head().get(0))
    // flat: explode + codegen'd hashes + groupBy min
    val ex = docs.select(col("doc_id"), explode(Dedup.wordShingles(text, 3)).as("g"))
    val aggs = (0 until 32).map(i => min(xxhash64(col("g"), lit(i))).as(s"m$i"))
    t("sig flat explode+groupBy")(ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count())
    spark.stop()
  }
}
