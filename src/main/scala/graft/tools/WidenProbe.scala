package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what Dedup.widen's partition-count probe costs per
  * invocation — `df.rdd.getNumPartitions` forces full physical
  * planning (analysis → optimization → physical plan → RDD
  * conversion) of the input once per dedup entry point, purely to
  * read a partition count (the r17 verdict's "What's wrong" #4).
  * Compares the `.rdd` probe against `queryExecution.toRdd` (skips
  * the row-deserializer projection) on plans of increasing depth, so
  * the scaladoc's stated cost is a measured number, not a guess.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *   sbt -batch "runMain graft.tools.WidenProbe"
  */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // plan depths a dedup input realistically arrives with: a bare scan,
    // a filtered projection, and a 10-step transform chain
    def chain(n: Int) = (1 to n).foldLeft(
      docs.filter(col("n_chars") > 10).select("doc_id", "text")) {
      (d, i) => d.withColumn(s"c$i", length(col("text")) + i)
    }
    val plans = Seq(
      "bare scan" -> docs,
      "filter+project" -> docs.filter(col("n_chars") > 10).select("doc_id", "text"),
      "10-step chain" -> chain(10),
      "30-step chain" -> chain(30))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }
    // warm the JVM/analyzer once outside the measured loop
    plans.foreach { case (_, df) => df.queryExecution.executedPlan }

    plans.foreach { case (name, df0) =>
      // fresh Dataset per rep: QueryExecution caches planning per
      // instance, and widen always sees a fresh one
      val reps = 20
      val rddMs = (1 to reps).map { _ =>
        time(df0.filter(lit(true)).rdd.getNumPartitions)._2 }.sorted
      val toRddMs = (1 to reps).map { _ =>
        time(df0.filter(lit(true)).queryExecution.toRdd.getNumPartitions)._2 }.sorted
      println(f"$name%-16s .rdd median ${rddMs(reps / 2)}%8.2f ms   " +
        f".toRdd median ${toRddMs(reps / 2)}%8.2f ms")
    }
    spark.stop()
  }
}
