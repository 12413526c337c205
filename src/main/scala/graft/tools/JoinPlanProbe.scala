package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry.table
import graft.ops.SchemaMappingOp
import graft.ops.SchemaMappingOp.JoinStep
import org.apache.spark.sql.functions.col

/** Dev-only: explain the PRE-SINK plan of the declarative join jobs
  * (PlanProbe on q_job_* only shows the output-parquet readback; the join
  * executes inside runSinks). Reconstructs the identical joinMode fold the
  * JobGraph dispatches to and dumps the formatted plan, to audit broadcast
  * choices on the dimension sides. */
object JoinPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("========== join3 chain (orders ⋈ customer ⋈ nation) ==========")
    val joined = SchemaMappingOp.joinMode(
      Map(
        "orders" -> table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "customer" -> table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        "nation" -> table(spark, dir, "nation")),
      Seq(
        JoinStep("orders", "customer", Seq("o_custkey"), Seq("c_custkey"),
          "inner", "oc"),
        JoinStep("oc", "nation", Seq("c_nationkey"), Seq("n_nationkey"),
          "inner", "ocn")))("ocn")
      .select(col("o_orderkey").as("order_id"), col("c_name").as("cust"),
        col("n_name").as("nation"), col("o_totalprice").as("price"))
    joined.explain("formatted")
    println(s"rows: ${joined.count()}")
    spark.stop()
  }
}
