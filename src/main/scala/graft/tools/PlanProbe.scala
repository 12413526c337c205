package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only: dump formatted plans for headline queries to audit pushdown,
  * broadcast choices, and codegen spans. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_filter_pass", "q_join_star", "q_agg_groups"))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
