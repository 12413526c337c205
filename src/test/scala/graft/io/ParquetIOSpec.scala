package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ParquetIOSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = java.nio.file.Paths.get("target", "test-tmp", "pqio", name).toAbsolutePath
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  test("cached read equals a plain read (schema and data)") {
    val dir = tmp("plain")
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "x")
      .write.mode("overwrite").parquet(dir)
    ParquetIO.clearCache()
    val a = ParquetIO.read(spark, dir)   // miss: infers + caches
    val b = ParquetIO.read(spark, dir)   // hit: schema from cache
    val plain = spark.read.parquet(dir)
    assert(a.schema === plain.schema)
    assert(b.schema === plain.schema)
    assert(b.orderBy("id").collect().toSeq === plain.orderBy("id").collect().toSeq)
  }

  test("overwriting a path with a different schema re-infers (no stale replay)") {
    val dir = tmp("invalidate")
    Seq((1L, "x")).toDF("id", "name").write.mode("overwrite").parquet(dir)
    ParquetIO.clearCache()
    assert(ParquetIO.read(spark, dir).columns.toSeq === Seq("id", "name"))
    // rewrite with a DIFFERENT schema: the file listing (names/mtimes)
    // changes, so the fingerprint misses and the new schema is inferred
    Seq((1L, 9.9, true)).toDF("id", "score", "ok")
      .write.mode("overwrite").parquet(dir)
    assert(ParquetIO.read(spark, dir).columns.toSeq === Seq("id", "score", "ok"))
  }

  test("appending files to a path is picked up (fingerprint covers new parts)") {
    val dir = tmp("append")
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    ParquetIO.clearCache()
    assert(ParquetIO.read(spark, dir).count() === 1)
    Seq((2L, "b")).toDF("id", "s").write.mode("append").parquet(dir)
    assert(ParquetIO.read(spark, dir).count() === 2)
  }

  test("partition-structured directories read identically through the cache") {
    val dir = tmp("parts")
    Seq((1L, "F", 10.0), (2L, "O", 20.0), (3L, "F", 30.0))
      .toDF("id", "status", "v")
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    ParquetIO.clearCache()
    val plain = spark.read.parquet(dir)
    val cachedMiss = ParquetIO.read(spark, dir)
    val cachedHit = ParquetIO.read(spark, dir)
    assert(cachedHit.schema === plain.schema) // partition col included
    assert(cachedHit.orderBy("id").collect().toSeq ===
      plain.orderBy("id").collect().toSeq)
    assert(cachedMiss.filter(col("status") === "F").count() === 2)
  }

  test("a nonexistent path still raises spark.read's own error") {
    ParquetIO.clearCache()
    intercept[Exception] {
      ParquetIO.read(spark, tmp("missing_nonexistent")).collect()
    }
  }
}
