package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, the single nearest right row within the
 * same `by` group — `direction = "backward"` (default) takes the most
 * recent right row at or before the left time (right.`on` <= left.`on`),
 * `"forward"` the earliest at or after (right.`on` >= left.`on`),
 * `"nearest"` whichever of the two is closer (ties to backward); equal
 * instants match in all. Null right columns when no such row exists. A
 * join variant the reference lacks entirely (SURVEY §2.4) and a staple
 * of event/feature alignment in training-data pipelines ("the last
 * purchase before this click", "the next error after this deploy").
 *
 * Spark-first shape: a naive range join explodes to O(|L|·|R|) pairs per
 * key before picking the max. Instead the two sides are UNIONED, sorted
 * once per key by (time, side), and each right value column is carried
 * forward with last(ignoreNulls) over an unbounded-preceding row frame —
 * ONE shuffle on the by-keys, one sort per partition, and the window
 * state is a single value per column (Spark's running-frame
 * implementation never buffers the group). All right columns share one
 * Window node in the plan (same spec, collapsed by Catalyst). The
 * forward direction REVERSES the sort (desc) and keeps the same running
 * frame — NOT a [currentRow, unboundedFollowing] frame, whose
 * UnboundedFollowingWindowFunctionFrame re-scans to the partition end
 * per row (O(n²) per key group).
 *
 * Preconditions / null semantics:
 *  - `right` must be unique per (by, on): with duplicates the carried
 *    value is partition-order-dependent. Dedup upstream.
 *  - null-time right rows match NOTHING (they are filtered out, like
 *    null by-keys): SQL ASOF's range predicate is never true for a null
 *    right time. Null-time left rows sort first (nulls-first in BOTH
 *    directions' orderings) so they precede every real right row and
 *    come back with null right columns — SQL ASOF matches them nowhere
 *    either.
 *  - null `by` keys match NOTHING (SQL equality, same as the ASOF JOIN
 *    oracle): null-keyed right rows are dropped, null-keyed left rows
 *    come back with null right columns.
 *  - right rows carry as ONE struct, so a match's genuinely-null value
 *    stays null instead of resurrecting an older row's value.
 *  - `tolerance` (optional) bounds the match distance, merge_asof-style:
 *    a carried right row farther than `tolerance` from the left time is
 *    nulled out. It is a SQL literal EXPRESSION comparable to the
 *    difference of two `on` values — an INTERVAL literal
 *    ("INTERVAL '1' HOUR") for timestamp times, a number for numeric
 *    times. Post-filtering the single carried match is sufficient: the
 *    nearest row is out of tolerance exactly when every farther row is.
 *
 * MEASURED scaling (tools/AsofProbe, synthetic events over n/100 users,
 * local[32], one aggregate forcing the carried column; struct-carry
 * implementation): 10M rows 1.48 s, 30M 2.35 s, 100M 9.05 s — 10x input
 * costs ~6x time (the 1M point, 2.8 s, is JIT-cold; checksums identical
 * to the pre-struct implementation). The only shuffle is the window's
 * hash partition on the by-keys; a bare count() over the result is NOT
 * a valid probe (column pruning deletes the window — AsofProbe
 * aggregates p_value).
 */
object AsofJoin {

  def apply(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
            suffix: String = "_r", direction: String = "backward",
            tolerance: Option[String] = None): DataFrame = {
    require(by.nonEmpty, "asof join needs at least one by-key")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asof join: unknown direction '$direction' (backward | forward | nearest)")
    require(left.columns.contains(on) && right.columns.contains(on),
      s"asof join: time column '$on' must exist on both sides")
    val rightVal = right.columns.filterNot(c => by.contains(c) || c == on).toSeq
    val outName = rightVal.map(c => if (left.columns.contains(c)) c + suffix else c)
    val leftRest = left.columns.filterNot(by.contains).toSeq // keeps `on` + data cols
    val clash = outName.toSet.intersect(leftRest.toSet ++ by)
    require(clash.isEmpty,
      s"asof join: suffixed right columns still collide with left: ${clash.mkString(", ")}")
    // Two right columns can land on the SAME suffixed name (right has
    // both `value` and `value_r` while left has `value`) — catch it here
    // instead of failing opaquely at the struct-field extraction.
    require(outName.distinct.size == outName.size,
      s"asof join: suffixed right columns collide with each other: " +
        outName.diff(outName.distinct).distinct.mkString(", "))
    val reserved = Set("__t", "__is_left", "__rv", "__rt", "__rvb", "__rvf")
    val reservedHit = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedHit.isEmpty,
      s"asof join: column names ${reservedHit.mkString(", ")} are reserved internally")
    require(rightVal.nonEmpty,
      "asof join: right side carries no value columns beyond the keys — " +
        "nothing to join (select the right columns to carry first)")

    // Right values travel as ONE struct (null on the left side, never
    // null on the right side even when every field is null): last() then
    // carries whole right ROWS atomically. A per-column
    // last(ignoreNulls) would treat a genuinely-null right value like
    // the left-side placeholder and stitch fields from DIFFERENT right
    // rows into one match — resurrecting values the true match nulled.
    // the matched right TIME rides in the struct too (`__rt`, reserved
    // above) so the tolerance filter can measure the match distance
    val rvStruct = struct(rightVal.zip(outName)
      .map { case (c, o) => col(c).as(o) } :+ col(on).as("__rt"): _*)
    val lhs = left.select(
      by.map(col) ++ Seq(col(on).as("__t"), lit(1).as("__is_left")) ++
        leftRest.map(col) :+
        lit(null).cast(right.select(rvStruct).schema.head.dataType).as("__rv"): _*)
    // SQL equality semantics for the by-keys: a null key matches nothing
    // (Window.partitionBy would group null keys together), so null-keyed
    // right rows are dropped — null-keyed left rows then see an empty
    // right side and carry nulls, exactly like the ASOF JOIN oracle.
    // Null-TIME right rows are dropped for the same reason: SQL ASOF's
    // range predicate (l.t >= r.t) is never true for a null right time,
    // but asc-nulls-first ordering would otherwise sort them before
    // every real row and hand them to every early left row.
    val rhs = right
      .filter((by.map(col(_).isNotNull) :+ col(on).isNotNull).reduce(_ && _))
      .select(
        by.map(col) ++ Seq(col(on).as("__t"), lit(0).as("__is_left")) ++
          leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          rvStruct.as("__rv"): _*)

    // right rows sort before left rows at the same instant → inclusive
    // match semantics in every direction. Backward walks time ascending
    // (carry = most recent prior right row); forward walks DESCENDING so
    // the same running carry yields the earliest following right row.
    // Nulls-first explicitly in both: desc's default NULLS LAST would
    // hand null-time left rows the whole partition's carry. `nearest`
    // computes BOTH carries — same hash partitioning, so ONE Exchange
    // with two sorts (pinned in AsofJoinSpec) — and picks the closer
    // match, ties to backward (the earlier right row).
    val unioned = lhs.unionByName(rhs)
    def carried(ord: Column): Column =
      last(col("__rv"), ignoreNulls = true).over(
        Window.partitionBy(by.map(col): _*)
          .orderBy(ord, col("__is_left").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val backOrd = col("__t").asc_nulls_first
    val fwdOrd = col("__t").desc_nulls_first
    def inTol(rv: Column, dist: Column): Column =
      tolerance.fold(rv)(t => when(dist <= expr(t), rv))
    val withMatch = direction match {
      case "nearest" =>
        val both = unioned
          .withColumn("__rvb", carried(backOrd))
          .withColumn("__rvf", carried(fwdOrd))
          .filter(col("__is_left") === 1)
        val db = col("__t") - col("__rvb.__rt")
        val df = col("__rvf.__rt") - col("__t")
        val b = inTol(col("__rvb"), db)
        val f = inTol(col("__rvf"), df)
        both.withColumn("__rv",
            when(b.isNull, f).when(f.isNull, b)
              .when(df < db, f).otherwise(b)) // tie → backward
          .drop("__rvb", "__rvf")
      case _ =>
        val ord = if (direction == "backward") backOrd else fwdOrd
        val c = unioned.withColumn("__rv", carried(ord))
          .filter(col("__is_left") === 1)
        tolerance.fold(c) { t =>
          val dist = if (direction == "backward") col("__t") - col("__rv.__rt")
                     else col("__rv.__rt") - col("__t")
          c.withColumn("__rv", when(dist <= expr(t), col("__rv")))
        }
    }
    withMatch.select(by.map(col) ++ leftRest.map(col) ++
      outName.map(o => col(s"__rv.`$o`").as(o)): _*)
  }
}
