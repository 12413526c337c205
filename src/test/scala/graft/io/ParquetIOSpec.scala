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

  test("merge_schema=true reads an evolving directory with the union schema") {
    val dir = tmp("evolve")
    // older file: (id, s); newer file added a column: (id, s, extra)
    Seq((1L, "a")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq((2L, "b", 99L)).toDF("id", "s", "extra")
      .coalesce(1).write.mode("append").parquet(dir)
    val schema =
      """{ "fields": [
        |  { "name": "id", "data_type": "integer" },
        |  { "name": "s", "data_type": "string" },
        |  { "name": "extra", "data_type": "integer", "nullable": true } ] }""".stripMargin
    def cfg(out: String, merge: String) =
      s"""{ "name": "ev", "components": [
         |  { "name": "r", "comp_type": "read_parquet", "filepath": "$dir",
         |    $merge
         |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": $schema } },
         |  { "name": "w", "comp_type": "write_parquet", "filepath": "$out",
         |    "in_port_schemas": { "in": $schema } } ] }""".stripMargin
    val out = tmp("evolve_out")
    val built = graft.graph.JobGraph.build(spark,
      graft.config.JobConfig.parse(cfg(out, """"merge_schema": true,""")))
    built.runSinks(); built.close()
    val got = spark.read.parquet(out).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // the old file's rows surface the new column as null
    assert(got.toSeq === Seq((1L, "a", -1L), (2L, "b", 99L)))
  }

  test("a nonexistent path still raises spark.read's own error") {
    ParquetIO.clearCache()
    intercept[Exception] {
      ParquetIO.read(spark, tmp("missing_nonexistent")).collect()
    }
  }
}
