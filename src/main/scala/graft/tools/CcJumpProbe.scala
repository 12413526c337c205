package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.scale.{Dedup, OpCaches}

/** Dev-only paired probe for the r21 connectedComponents experiment:
  * POINTER JUMPS PER ROUND. One jump per round (the r19/r20 shape)
  * roughly doubles covered label depth per round; j jumps multiply it
  * ~2^j at the cost of one extra V-row self-join per extra jump — fewer
  * rounds means fewer edge joins, checkpoints and convergence actions,
  * which is where deep-graph loop wall lives. Fixture matches
  * CcCheckProbe (length-512 chains, ~10 one-jump rounds, 1M vertices);
  * arms run interleaved 1/2/2/1 (then 3/3) after a discarded warmup so
  * machine drift cancels within the pair. Run with no other Spark JVM
  * alive:
  *
  *   SPARK_DRIVER_MEM=96g sbt -batch "runMain graft.tools.CcJumpProbe"
  */
object CcJumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cc-jump-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val v = args.headOption.map(_.toLong).getOrElse(1000000L)
    val chainLen = 512L
    def edges = spark.range(v).toDF("id_a")
      .filter((col("id_a") + 1) % chainLen =!= 0 && col("id_a") + 1 < v)
      .select(col("id_a"), (col("id_a") + 1).as("id_b"))
      .repartition(32)

    def run(tag: String, jumps: Int): Double = {
      val rounds = scala.collection.mutable.ArrayBuffer[(Int, Double, Double, Long)]()
      val t0 = System.nanoTime()
      val n = Dedup.ccProbed(edges, "id_a", "id_b", 25, 1,
        (r, st, ct, ch) => rounds += ((r, st, ct, ch)),
        jumpsPerRound = jumps).count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"cc $tag%-10s v=$v%-9d labeled=$n%-9d rounds=${rounds.size} " +
        f"total=$total%6.2f s step=${rounds.map(_._2).sum}%6.2f s " +
        f"check=${rounds.map(_._3).sum}%5.2f s")
      OpCaches.drain(); spark.catalog.clearCache()
      total
    }

    run("warmup", jumps = 1) // JIT/codegen warm, excluded from pairs
    val a1 = run("jumps=1", 1)
    val b1 = run("jumps=2", 2)
    val b2 = run("jumps=2", 2)
    val a2 = run("jumps=1", 1)
    val c1 = run("jumps=3", 3)
    val c2 = run("jumps=3", 3)
    // 2-run arithmetic means (see CcCheckProbe's caveat on n=2)
    val a = (a1 + a2) / 2; val b = (b1 + b2) / 2; val c = (c1 + c2) / 2
    println(f"paired 2-run means: jumps=1 $a%.2f s, jumps=2 $b%.2f s " +
      f"(${a / b}%.2fx), jumps=3 $c%.2f s (${a / c}%.2fx; >1 = extra jumps win)")
    spark.stop()
  }
}
