package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table

/** Dev-only stage timing for the q_job_csv_filter pipeline. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val inDir = "/root/repo/target/tmp/probe_in"
    val outDir = "/root/repo/target/tmp/probe_out"
    t("stage write") {
      graft.io.CsvIO.write(table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag")),
        inDir, sep = ",")
    }
    val read = t("read plan+infer") { graft.io.CsvIO.read(spark, inDir) }
    t("read count") { read.count() }
    import graft.ops._
    import graft.schema.GraftType._
    val conv = t("convert plan") {
      TypeConversionOp(read, Seq(
        TypeConversionOp.CastRule("l_orderkey", TInteger, TypeConversionOp.RaisePolicy),
        TypeConversionOp.CastRule("l_linenumber", TInteger, TypeConversionOp.RaisePolicy),
        TypeConversionOp.CastRule("l_quantity", TInteger, TypeConversionOp.RaisePolicy)))
    }
    t("convert count") { conv.count() }
    val filtered = FilterOp(conv, FilterOp.Node("AND", Seq(
      FilterOp.Leaf("l_quantity", "<=", 20),
      FilterOp.Node("NOT", Seq(FilterOp.Leaf("l_returnflag", "==", "A"))))))("pass")
    println("filtered partitions: " + filtered.rdd.getNumPartitions)
    t("filtered write") {
      graft.io.CsvIO.write(filtered, outDir, sep = ",", singleFile = false)
    }
    t("readback count") { graft.io.CsvIO.read(spark, outDir).count() }
    // variants to isolate the cost
    val rawFiltered = FilterOp(read, FilterOp.Node("AND", Seq(
      FilterOp.Leaf("l_returnflag", "!=", "A"))))("pass")
    t("write no-convert") {
      graft.io.CsvIO.write(rawFiltered, outDir + "2", sep = ",", singleFile = false)
    }
    val convNull = TypeConversionOp(read, Seq(
      TypeConversionOp.CastRule("l_orderkey", TInteger, TypeConversionOp.NullPolicy),
      TypeConversionOp.CastRule("l_linenumber", TInteger, TypeConversionOp.NullPolicy),
      TypeConversionOp.CastRule("l_quantity", TInteger, TypeConversionOp.NullPolicy)))
    t("write null-policy") {
      graft.io.CsvIO.write(convNull, outDir + "3", sep = ",", singleFile = false)
    }
    t("write raise-policy-only") {
      graft.io.CsvIO.write(conv, outDir + "4", sep = ",", singleFile = false)
    }
    spark.stop()
  }
}
