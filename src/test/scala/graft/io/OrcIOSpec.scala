package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** OrcIO: type-fidelity roundtrip, the two scan-side scale levers
  * (partition pruning + predicate pushdown — the format's reason to
  * exist next to parquet), and the small-files control. */
class OrcIOSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("data").toString

  test("roundtrip preserves types and values") {
    val out = tmp("graft_orc_rt")
    val src = spark.range(50).select(
      col("id"),
      col("id").cast("int").as("i32"),
      (col("id") * 1.5).as("d"),
      concat(lit("s"), col("id")).as("s"),
      (col("id") % 2 === 0).as("b"),
      to_timestamp(lit("2026-01-02 03:04:05")).as("ts"),
      array(col("id").cast("float"), lit(0.5f)).as("vec"))
    OrcIO.write(src, out)
    val back = OrcIO.read(spark, out)
    // file sources read everything back nullable (like parquet) —
    // names and types are the fidelity contract
    assert(back.schema.map(f => (f.name, f.dataType.sql)) ===
      src.schema.map(f => (f.name, f.dataType.sql)))
    assert(back.orderBy("id").collect().toSeq ===
      src.orderBy("id").collect().toSeq)
  }

  test("partitioned write prunes on readback; values survive the layout") {
    val out = tmp("graft_orc_part")
    val src = spark.range(300).select(col("id"),
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c").as("k"))
    OrcIO.write(src, out, partitionBy = Seq("k"))
    val filtered = OrcIO.read(spark, out).filter(col("k") === "b")
    val formatted = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PartitionFilters") && formatted.contains("k#"),
      s"ORC scan must carry a PartitionFilter on k:\n$formatted")
    assert(filtered.select(sum(col("id"))).as[Long].head() ===
      (0L until 300L).filter(_ % 3 == 1).sum)
  }

  test("non-partition predicates push into the ORC scan (PushedFilters)") {
    val out = tmp("graft_orc_push")
    OrcIO.write(spark.range(100).select(col("id"),
      (col("id") * 2).as("v")), out)
    val filtered = OrcIO.read(spark, out).filter(col("v") > 120)
    val formatted = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val at = formatted.indexOf("PushedFilters: [")
    assert(at >= 0 && formatted.substring(at).takeWhile(_ != ']').contains("v"),
      s"v > 120 must reach the ORC scan's PushedFilters:\n$formatted")
    assert(filtered.count() === 39)
  }

  test("coalesce bounds the output file count; bad values are loud") {
    val out = tmp("graft_orc_files")
    OrcIO.write(spark.range(1000).toDF("id").repartition(8), out,
      coalesceTo = Some(1))
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".orc"))
    assert(files.length === 1, s"expected 1 orc file, got ${files.length}")
    intercept[IllegalArgumentException] {
      OrcIO.write(spark.range(1).toDF("id"), out, coalesceTo = Some(0))
    }
  }
}
