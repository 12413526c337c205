package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Pins the r21 readback shortcut (ParquetIO.readAs: read a just-written
 * output trusting the writer frame's schema, skipping the per-call
 * footer-inference job): for every type a declared sink schema can
 * carry, a parquet write → INFERRED read must yield exactly
 * deepNullable(written schema) — the contract that makes readAs
 * bit-identical to inference on the gate surface. If Spark's parquet
 * type roundtrip ever changes for one of these, this spec names it
 * before a gate hash does.
 */
class JobReadbackSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = java.nio.file.Paths.get("target", "test-tmp", "readback", name)
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  test("inferred schema == deepNullable(written schema) for every declared-sink type") {
    val df = Seq((
      1, 2L, 3.5f, 4.5d, "s", true,
      Seq(1.0f, 2.0f), Seq(1.0d), Seq("a"), Seq(7, 8)
    )).toDF("i", "l", "f", "d", "s", "b", "af", "ad", "as", "ai")
    val path = tmp("types")
    df.write.mode("overwrite").parquet(path)
    val inferred = spark.read.parquet(path).schema
    val expected = ParquetIO.deepNullable(df.schema)
    assert(inferred === expected,
      s"parquet type roundtrip drifted:\n inferred=$inferred\n expected=$expected")
    // and readAs returns the same schema AND rows as the inferred read
    val viaSchema = ParquetIO.readAs(spark, path, df.schema)
    assert(viaSchema.schema === inferred)
    assert(viaSchema.collect().toSeq === spark.read.parquet(path).collect().toSeq)
  }

  test("deepNullable normalizes nested structs, arrays and maps") {
    val st = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("nested", StructType(Seq(
        StructField("x", ArrayType(LongType, containsNull = false), nullable = false))),
        nullable = false),
      StructField("m", MapType(StringType, DoubleType, valueContainsNull = false))))
    val n = ParquetIO.deepNullable(st).asInstanceOf[StructType]
    assert(n.forall(_.nullable))
    assert(n("nested").dataType.asInstanceOf[StructType].forall(_.nullable))
    assert(n("nested").dataType.asInstanceOf[StructType]("x")
      .dataType.asInstanceOf[ArrayType].containsNull)
    assert(n("m").dataType.asInstanceOf[MapType].valueContainsNull)
  }

  test("readAs round-trips a non-nullable writer frame identically to inference") {
    // spark.range frames are non-nullable at the writer — the exact shape
    // a sink frame can have; the readback must still match inference
    val df = spark.range(5).toDF("id").withColumn("v", col("id") * 2)
    val path = tmp("nonnull")
    df.write.mode("overwrite").parquet(path)
    val inferred = spark.read.parquet(path)
    val via = ParquetIO.readAs(spark, path, df.schema)
    assert(via.schema === inferred.schema)
    assert(via.orderBy("id").collect().toSeq === inferred.orderBy("id").collect().toSeq)
  }
}
