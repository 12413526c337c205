package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timing for the declarative join+agg job (the
  * q_job_join_agg shape): parse / build / runSinks / close / readback,
  * N iterations, per-phase medians. Written to chase the r10 verdict's
  * "~80 ms declarative-job constant overhead" — run it on two commits
  * (worktree the older one) and compare phase medians. Run ALONE like
  * the other timing probes. */
object JobPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val outDir = "/root/repo/target/tmp/probe_joinagg"
    def fields(fs: (String, String)*): String =
      fs.map { case (n, t) => s"""{ "name": "$n", "data_type": "$t" }""" }
        .mkString("""{ "fields": [ """, ", ", " ] }")
    val custSchema = fields("c_custkey" -> "integer", "c_name" -> "string",
      "c_nationkey" -> "integer", "c_acctbal" -> "float", "c_mktsegment" -> "string")
    val ordSchema = fields("o_orderkey" -> "integer", "o_custkey" -> "integer",
      "o_orderstatus" -> "string", "o_totalprice" -> "float",
      "o_orderdate" -> "string", "o_orderpriority" -> "string")
    val mappedSchema = fields("segment" -> "string", "price" -> "float")
    val aggSchema = fields("segment" -> "string", "n_orders" -> "integer",
      "min_price" -> "float", "max_price" -> "float")
    val jobJson =
      s"""{
         |  "name": "join_agg_job",
         |  "components": [
         |    { "name": "cust", "comp_type": "read_parquet",
         |      "filepath": "$dir/customer.parquet",
         |      "routes": { "out": [ { "to": "sm", "in_port": "customer" } ] },
         |      "out_port_schemas": { "out": $custSchema } },
         |    { "name": "ord", "comp_type": "read_parquet",
         |      "filepath": "$dir/orders.parquet",
         |      "routes": { "out": [ { "to": "sm", "in_port": "orders" } ] },
         |      "out_port_schemas": { "out": $ordSchema } },
         |    { "name": "sm", "comp_type": "schema_mapping",
         |      "join_plan": { "steps": [
         |        { "left_port": "orders", "right_port": "customer",
         |          "left_on": ["o_custkey"], "right_on": ["c_custkey"],
         |          "how": "inner", "output_port": "joined" } ] },
         |      "rules_by_dest": { "out": {
         |        "segment": { "src_port": "joined", "src_path": "c_mktsegment" },
         |        "price":   { "src_port": "joined", "src_path": "o_totalprice" } } },
         |      "in_port_schemas": { "customer": $custSchema, "orders": $ordSchema },
         |      "routes": { "out": [ { "to": "agg", "in_port": "in" } ] },
         |      "out_port_schemas": { "out": $mappedSchema } },
         |    { "name": "agg", "comp_type": "aggregation",
         |      "group_by": ["segment"],
         |      "aggregations": [
         |        { "src": "*", "op": "count", "dest": "n_orders" },
         |        { "src": "price", "op": "min", "dest": "min_price" },
         |        { "src": "price", "op": "max", "dest": "max_price" } ],
         |      "in_port_schemas": { "in": $mappedSchema },
         |      "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
         |      "out_port_schemas": { "out": $aggSchema } },
         |    { "name": "w", "comp_type": "write_parquet", "filepath": "$outDir",
         |      "in_port_schemas": { "in": $aggSchema } }
         |  ]
         |}""".stripMargin

    val phases = Seq("parse", "build", "runSinks", "close", "readback")
    val times = scala.collection.mutable.Map(phases.map(_ -> Vector.empty[Double]): _*)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e6
      r
    }
    (1 to iters).foreach { i =>
      val spec = t("parse") { graft.config.JobConfig.parse(jobJson) }
      val built = t("build") { graft.graph.JobGraph.build(spark, spec) }
      t("runSinks") { built.runSinks() }
      t("close") { built.close() }
      t("readback") { spark.read.parquet(outDir).orderBy(col("segment")).count() }
      println(f"iter $i%2d  " + phases.map(p => f"$p=${times(p).last}%.1f").mkString("  "))
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    // first iteration is JIT-cold — medians over the rest
    println("medians (ms, iter>1): " +
      phases.map(p => f"$p=${med(times(p).drop(1))}%.1f").mkString("  "))

    // micro-breakdown of the build constant: where inside build?
    def micro(name: String, n: Int)(f: => Unit): Unit = {
      val ts = Vector.fill(n) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"micro $name%-28s med=${med(ts.drop(1))}%6.1f ms  " +
        ts.map(t => f"$t%.0f").mkString(" "))
    }
    micro("read.parquet(customer)", 8) { spark.read.parquet(s"$dir/customer.parquet") }
    micro("read.parquet(orders)", 8) { spark.read.parquet(s"$dir/orders.parquet") }
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    micro("df.schema (analyzed)", 8) { cust.schema }
    // is the 70 ms the footer-read inference or the DataSource machinery?
    micro("read.parquet w/ schema", 8) {
      spark.read.schema(cust.schema).parquet(s"$dir/customer.parquet")
    }
    val spec = graft.config.JobConfig.parse(jobJson)
    micro("parse+validate only", 8) { graft.graph.JobGraph.topoOrder(spec) }
    micro("full build", 8) { graft.graph.JobGraph.build(spark, spec) }
    spark.stop()
  }
}
