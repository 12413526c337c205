package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: AsofJoin wall-clock vs input size on synthetic events
  * (spark.range-generated — no testdata involved). Usage:
  *   SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.AsofProbe 1000000 10000000"
  * Prints one line per size: rows, left rows, output rows, seconds.
  * Run ALONE (no other Spark JVM) like the other timing probes. */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(1000000L, 10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sizes.foreach { n =>
      // n events over n/100 users; even ids = left (clicks), odd = right
      // (purchases). user_id derives from id/2 so each user gets BOTH
      // sides (id%users would give every user a single parity = zero
      // matches); time = a deterministic shuffle of the id space
      val ev = spark.range(n).select(
        col("id"),
        // (/ is DOUBLE division on columns — cast back to integral ids)
        ((col("id") / 2).cast("long") % (n / 100)).as("user_id"),
        ((col("id") * 2654435761L) % 1000000007L).as("t"),
        (col("id") % 97).cast("double").as("value"))
        .persist()
      ev.count()
      val left = ev.filter(col("id") % 2 === 0)
        .select(col("id").as("event_id"), col("user_id"), col("t"), col("value"))
      val right = ev.filter(col("id") % 2 === 1)
        .select(col("user_id"), col("t"), col("value").as("p_value"))
      val t0 = System.nanoTime()
      // aggregate over the CARRIED column: a bare count() would let
      // column pruning drop the window computation entirely
      val row = graft.ops.AsofJoin(left, right, on = "t", by = Seq("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("p_value")).as("s")).head()
      val dt = (System.nanoTime() - t0) / 1e9
      val checksum = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      require(checksum != 0.0, "probe bug: no asof matches — timing would be vacuous")
      println(f"[asof] n=$n%d left=${n / 2}%d out=${row.getLong(0)}%d " +
        f"checksum=$checksum%.1f sec=$dt%.2f")
      ev.unpersist()
    }
    spark.stop()
  }
}
