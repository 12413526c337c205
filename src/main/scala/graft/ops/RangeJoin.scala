package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: each left row matched to every right row whose
 * `[start, end]` interval contains the left `on` value (inclusive
 * bounds), with optional `by`-key equality. A join variant the reference
 * lacks (SURVEY §2.4 — equi-join only) and the standard shape for
 * "which campaign / config epoch / maintenance window was active at
 * this event". Unlike [[AsofJoin]] this is one-to-MANY: overlapping
 * intervals each produce a match row; use asof for nearest-one.
 *
 * Spark-first plan shapes:
 *  - WITH `by` keys: an equi-join on the keys carrying the range
 *    predicate as an extra join condition — both sides hash-partition on
 *    the keys, the range filter evaluates inside the
 *    SortMergeJoin/ShuffledHashJoin, and no cross product ever forms.
 *    This is the 100 TB path: pick by-keys so key groups are bounded.
 *  - WITHOUT `by` keys there is no equality to hash on and Spark's only
 *    distributed shape is a nested-loop against the interval side, so
 *    that side is explicitly `broadcast()`: correct and fast exactly
 *    when intervals are dimension-sized (calendars, campaigns, release
 *    epochs — the overwhelmingly common case). An interval side too big
 *    to broadcast needs by-keys instead; the loud broadcast in the plan
 *    makes the cost visible in `.explain`.
 *
 * Column management mirrors AsofJoin: right non-key columns (including
 * `start`/`end`) carry into the output, suffixed on collision with a
 * left column; `by` keys dedup to the left side's.
 *
 * Null semantics are plain SQL: a null left `on`, null interval bound,
 * or null by-key never satisfies the predicate (inner: row dropped;
 * left: null right columns).
 */
object RangeJoin {

  def apply(left: DataFrame, right: DataFrame, on: String,
            start: String, end: String, by: Seq[String] = Nil,
            suffix: String = "_r", joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left").contains(joinType),
      s"range join: joinType must be inner|left, got '$joinType'")
    require(left.columns.contains(on),
      s"range join: left time column '$on' missing")
    require(right.columns.contains(start) && right.columns.contains(end),
      s"range join: interval columns '$start'/'$end' must exist on the right")
    by.foreach(k => require(
      left.columns.contains(k) && right.columns.contains(k),
      s"range join: by-key '$k' must exist on both sides"))
    require(!by.contains(start) && !by.contains(end),
      s"range join: interval columns '$start'/'$end' cannot also be by-keys")
    val rightVal = right.columns.filterNot(by.contains).toSeq
    val outName = rightVal.map(c => if (left.columns.contains(c)) c + suffix else c)
    val clash = outName.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"range join: suffixed right columns still collide with left: ${clash.mkString(", ")}")
    require(outName.distinct.size == outName.size,
      s"range join: suffixed right columns collide with each other: " +
        outName.diff(outName.distinct).distinct.mkString(", "))
    // The right by-keys get UNIQUE temp names before the join. Dropping
    // the right key by column reference (`df.drop(r(k))`) mis-resolves
    // when both sides share lineage (a self-join over the same source):
    // Spark's attribute dedup can pick the LEFT instance, which a left
    // join exposes as nulled left keys on every unmatched row. A rename
    // leaves nothing ambiguous to resolve.
    val keyAlias = by.map(k => k -> s"__range_by_$k").toMap
    keyAlias.values.foreach(a => require(
      !left.columns.contains(a) && !outName.contains(a),
      s"range join: internal key alias '$a' collides with a data column"))
    val r0 = right.select(
      (by.map(k => col(k).as(keyAlias(k))) ++
        rightVal.zip(outName).map { case (c, o) => col(c).as(o) }): _*)
    val r = if (by.isEmpty) broadcast(r0) else r0
    val sOut = outName(rightVal.indexOf(start))
    val eOut = outName(rightVal.indexOf(end))
    val rangeCond = left(on) >= r(sOut) && left(on) <= r(eOut)
    val cond = by.map(k => left(k) === r(keyAlias(k))).foldRight(rangeCond)(_ && _)
    keyAlias.values.foldLeft(left.join(r, cond, joinType))((df, a) => df.drop(a))
  }
}
