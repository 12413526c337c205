package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (r22): pin the profile plan-split's crossover AT SCALE.
  *
  * The r21 split (Profile.profile exact face: plain aggs × distinct aggs
  * cross-joined) was measured a 3.5× win at sf0.1 only; the open question
  * (r21 VERDICT item 3) is whether TWO scans still beat ONE scan whose
  * Expand×(k+1) replicates every row k+1 times through the first
  * aggregate stage when the input is large. Replicate the sf0.1 orders
  * table N× with salted keys (ScaleProbe's technique) and time the two
  * faces noop-style, interleaved fused/split/split/fused so drift
  * cancels. k = 5 profiled columns, exact distincts — the q_profile
  * shape.
  */
object ProfileScale22 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
      "o_orderpriority")
    val orders = graft.SparkEntry.table(spark, dir, "orders").select(cols.map(col): _*)
    // N replicas with distinct keys (salt shifts the key space per replica)
    // so n_distinct grows with the data — the Expand stage's cost driver
    val reps = spark.range(factor).select(col("id").as("__rep"))
    val big = orders.crossJoin(reps)
      .select(
        (col("o_orderkey") + col("__rep") * 10000000L).as("o_orderkey"),
        (col("o_custkey") + col("__rep") * 10000000L).as("o_custkey"),
        col("o_totalprice"), col("o_orderstatus"), col("o_orderpriority"))
      .repartition(32)
      .persist()
    val n = big.count()
    println(s"rows = $n (factor $factor)")

    def fused(df: DataFrame): DataFrame = {
      val plain = count(lit(1)).as("rows") +: cols.map(c => count(col(c)).as(s"nn_$c"))
      val dist = cols.map(c => count_distinct(col(c)).as(s"nd_$c"))
      df.agg((plain ++ dist).head, (plain ++ dist).tail: _*)
    }
    def split(df: DataFrame): DataFrame = {
      val plain = count(lit(1)).as("rows") +: cols.map(c => count(col(c)).as(s"nn_$c"))
      val dist = cols.map(c => count_distinct(col(c)).as(s"nd_$c"))
      df.agg(plain.head, plain.tail: _*).crossJoin(df.agg(dist.head, dist.tail: _*))
    }
    def t(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$name%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    t("warm f")(fused(big)); t("warm s")(split(big)) // discarded
    for (_ <- 1 to 2) {
      t("fused")(fused(big)); t("split")(split(big))
      t("split")(split(big)); t("fused")(fused(big))
    }
    big.unpersist()
    spark.stop()
  }
}
