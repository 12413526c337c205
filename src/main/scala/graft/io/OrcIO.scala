package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * ORC source/sink — the second columnar format next to parquet
 * (beyond-reference: the reference's file surface is CSV/JSON/XML/Excel,
 * SURVEY §2.2; a 100 TB lake routinely carries ORC alongside parquet,
 * e.g. Hive-era tables being migrated).
 *
 * Spark's native ORC datasource has the same scale properties as its
 * parquet one: vectorized columnar reads, column pruning (ReadSchema),
 * predicate pushdown into stripe/row-group min-max stats (PushedFilters
 * — OrcIOSpec pins both on the physical plan), and Hive-style directory
 * partitioning on write. The JobGraph faces (`read_orc`/`write_orc`)
 * mirror the parquet component's options — partition_by as the layout
 * lever, coalesce as small-files control — so swapping a pipeline
 * between the two formats is a one-word config change.
 *
 * No schema-inference cache (unlike ParquetIO): ORC footer inference is
 * one file read, and the format is the MIGRATION path here, not the
 * hot job-per-minute one; add the cache if a control-plane workload
 * ever re-reads ORC at that cadence.
 */
object OrcIO {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil,
            coalesceTo: Option[Int] = None): Unit = {
    coalesceTo.foreach(n => require(n >= 1,
      s"write_orc: coalesce must be >= 1, got $n"))
    val src = coalesceTo.map(df.coalesce).getOrElse(df)
    val w = src.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
