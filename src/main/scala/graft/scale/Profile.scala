package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Column-level data profiling — the validation pass a training-data
 * pipeline runs before ingest (null rates, cardinalities, ranges), as
 * one operator. Beyond the reference's surface (its schema layer
 * validates structure, never data distributions).
 *
 * ONE distributed scan: every profiled column contributes its
 * count/distinct/min/max aggregates to a single wide global aggregate
 * (Spark plans the distinct aggregates through one Expand + two-phase
 * aggregate — input rows are replicated once per DISTINCT column, the
 * standard plan shape), then the single result row is unpivoted
 * driver-side into one row per column. No per-column rescans.
 *
 * Exact by default so the output is oracle-replayable (count, nulls,
 * distinct, min/max select existing values — bit-identical across
 * engines). `approx = true` swaps exact distincts for HyperLogLog
 * approx_count_distinct, dropping the Expand entirely — the 100 TB path
 * when cardinalities only need to be ballpark.
 */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              approx: Boolean = false): DataFrame = {
    // resolve requested names case-insensitively (like the rest of
    // Spark's column resolution) and reject duplicates/unknowns HERE —
    // both would otherwise surface as AnalysisExceptions naming the
    // internal __nn_/__nd_ aliases the user never wrote
    val cols =
      if (columns.isEmpty) df.columns.toSeq
      else columns.map(c => df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"profile: unknown column $c")))
    val dups = cols.diff(cols.distinct).distinct
    require(dups.isEmpty, s"profile: duplicate columns ${dups.mkString(", ")}")

    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      val base = Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approx) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"__nd_$c"))
      val mm =
        if (isNumeric(df.schema(c).dataType))
          Seq(min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
        else
          Seq(min(col(c)).cast("string").as(s"__mins_$c"),
            max(col(c)).cast("string").as(s"__maxs_$c"))
      base ++ mm
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the single aggregate row with ONE explode over an array of
    // per-column structs — a single plan branch. A per-column
    // select+union here would invite column pruning to split the wide
    // aggregate into k independent aggregates, i.e. k scans of `df`,
    // silently breaking the operator's one-scan contract.
    val perCol = cols.map { c =>
      val numeric = isNumeric(df.schema(c).dataType)
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        (if (numeric) col(s"__min_$c") else lit(null).cast("double")).as("min_num"),
        (if (numeric) col(s"__max_$c") else lit(null).cast("double")).as("max_num"),
        (if (numeric) lit(null).cast("string") else col(s"__mins_$c")).as("min_str"),
        (if (numeric) lit(null).cast("string") else col(s"__maxs_$c")).as("max_str"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }
}
