package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.scale.{Dedup, OpCaches}

/** Dev-only paired probe for the connectedComponents convergence-check
  * experiment (round-20 VERDICT task): per-round changed-count as a
  * JOIN against the previous labels (the r19 shape, ~20-22% of loop
  * wall in the ScaleProbe table) vs FUSED — carry the round-entry label
  * through the jump as `prev` and count from the just-checkpointed
  * blocks with no join.
  *
  * Fixture matches the ScaleProbe cc stage (length-512 chains, ~10
  * pointer-jump rounds, 1M vertices); variants run interleaved
  * A/B/B/A so machine drift cancels within the pair. Run with no other
  * Spark JVM alive:
  *
  *   SPARK_DRIVER_MEM=96g sbt -batch "runMain graft.tools.CcCheckProbe"
  */
object CcCheckProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cc-check-probe")
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

    def run(tag: String, fused: Boolean): (Double, Double, Double) = {
      val rounds = scala.collection.mutable.ArrayBuffer[(Int, Double, Double, Long)]()
      val t0 = System.nanoTime()
      val n = Dedup.ccProbed(edges, "id_a", "id_b", 25, 1,
        (r, st, ct, ch) => rounds += ((r, st, ct, ch)),
        fusedCheck = fused).count()
      val total = (System.nanoTime() - t0) / 1e9
      val stepSum = rounds.map(_._2).sum
      val checkSum = rounds.map(_._3).sum
      println(f"cc $tag%-12s v=$v%-9d labeled=$n%-9d rounds=${rounds.size} " +
        f"total=$total%6.2f s step=$stepSum%6.2f s check=$checkSum%5.2f s " +
        f"(check share ${100 * checkSum / (stepSum + checkSum)}%2.0f%%)")
      OpCaches.drain(); spark.catalog.clearCache()
      (total, stepSum, checkSum)
    }

    run("warmup", fused = false) // JIT/codegen warm, excluded from pairs
    val a1 = run("join-check", fused = false)
    val b1 = run("fused", fused = true)
    val b2 = run("fused", fused = true)
    val a2 = run("join-check", fused = false)
    // 2-run arithmetic MEANS, labeled as such: with n=2 a mean and a
    // median coincide numerically but a "median" label would promise an
    // outlier robustness two samples cannot have — cross-check the two
    // runs' spread before trusting the ratio
    val aTot = (a1._1 + a2._1) / 2; val bTot = (b1._1 + b2._1) / 2
    println(f"paired 2-run means: join-check=$aTot%.2f s fused=$bTot%.2f s " +
      f"ratio=${aTot / bTot}%.2fx (fused wins if > 1)")
    spark.stop()
  }
}
