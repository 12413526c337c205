package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Declarative window functions: rank/row_number/lag/lead and running
 * aggregates over `PARTITION BY ... ORDER BY ...` — the "top-n per
 * group" / "previous event per user" primitive a training-data pipeline
 * reaches for constantly (keep the best-quality document per URL, delta
 * vs the previous event, cumulative token budget per source).
 *
 * Beyond the reference's surface (its aggregation component only folds
 * whole groups — reference: src/etl_core/components/data_operations/
 * aggregation/aggregation_component.py — there is no per-row analytic
 * over an ordered partition); Spark's native window exec expresses this
 * directly, so the operator is a pure Column builder: no custom exec,
 * whole-stage codegen'd, AQE-planned.
 *
 * Frame semantics: ordered aggregates keep Spark's default frame
 * (RANGE UNBOUNDED PRECEDING → CURRENT ROW, peers included) — the SQL
 * standard default, identical in DuckDB, so oracles replay bit-exactly;
 * unordered aggregates span the whole partition. Rank ties follow the
 * order keys: pass a unique tie-breaking key for deterministic output
 * (same rule findLike documents for sort).
 *
 * At scale: ONE hash exchange on the partition keys + in-partition sort
 * — the same shuffle an aggregation on those keys would pay; per-row
 * state is O(1) for rank/lag/running frames (Spark streams the frame,
 * nothing buffers the partition for these frame shapes). An EMPTY
 * partition_by means every row flows through ONE task — a global window
 * is the canonical single-partition scale killer, so it must be opted
 * into explicitly (`allow_global`); global order-sensitive work belongs
 * to sort/shuffle (range-partitioned total order) instead.
 */
object WindowOp {

  /** One window function: `fn` over `src` (aggregates/lag/lead; rank
    * family takes none), writing `dest`. `offset` feeds lag/lead.
    * `frameRows` (aggregates only, needs order_by) switches the frame
    * to a TRAILING ROWS window of the last N rows including the current
    * one — ROWS BETWEEN N-1 PRECEDING AND CURRENT ROW — the moving-
    * average/rolling-sum shape. ROWS (not RANGE): order-key ties do NOT
    * share a frame, so pass a unique tie-breaker for determinism, same
    * rule as rank. Spark streams the frame with O(N) state per task —
    * no partition buffering, same one-exchange plan. */
  final case class WinFn(fn: String, src: Option[String], offset: Int, dest: String,
                         frameRows: Option[Int] = None)

  /** percent_rank/cume_dist/ntile join the rank family for quality-
    * percentile curation ("keep the top 20% by score per source",
    * "split into n quality buckets"): standard SQL semantics, identical
    * in DuckDB, so oracles replay bit-exactly. ntile reads its bucket
    * count from `offset` (the one integer slot the surface carries). */
  val rankFns = Set("row_number", "rank", "dense_rank", "percent_rank",
    "cume_dist", "ntile")
  val offsetFns = Set("lag", "lead")
  val aggFns = Set("sum", "min", "max", "mean", "avg", "count", "first", "last")

  def apply(df: DataFrame,
            partitionBy: Seq[String],
            orderBy: Seq[(String, Int)],
            fns: Seq[WinFn],
            allowGlobal: Boolean = false): DataFrame = {
    require(fns.nonEmpty, "window: needs at least one function")
    require(partitionBy.nonEmpty || allowGlobal,
      "window: empty partition_by runs the whole input through ONE task; " +
        "set allow_global=true only for small frames, or use sort/shuffle " +
        "for global order at scale")
    val dests = fns.map(_.dest)
    require(dests.distinct.size == dests.size,
      s"window: duplicate dest names in ${dests.mkString(", ")}")
    dests.foreach(d => require(!df.columns.contains(d),
      s"window: input already has a '$d' column; pick another dest"))

    val base = Window.partitionBy(partitionBy.map(col): _*)
    val ordered =
      if (orderBy.isEmpty) base
      else base.orderBy(orderBy.map { case (f, dir) =>
        if (dir >= 0) col(f).asc else col(f).desc
      }: _*)

    val cols = fns.map { w =>
      def src: Column = col(w.src.getOrElse(throw new IllegalArgumentException(
        s"window: function '${w.fn}' needs 'src'")))
      def needOrder(): Unit = require(orderBy.nonEmpty,
        s"window: function '${w.fn}' needs non-empty order_by")
      val expr = w.fn match {
        case "row_number" => needOrder(); row_number()
        case "rank"       => needOrder(); rank()
        case "dense_rank" => needOrder(); dense_rank()
        case "percent_rank" => needOrder(); percent_rank()
        case "cume_dist"  => needOrder(); cume_dist()
        case "ntile" =>
          needOrder()
          require(w.offset >= 1,
            s"window: ntile needs offset >= 1 (the bucket count), got ${w.offset}")
          ntile(w.offset)
        case "lag"        => needOrder(); lag(src, w.offset)
        case "lead"       => needOrder(); lead(src, w.offset)
        case "sum"        => sum(src)
        case "min"        => min(src)
        case "max"        => max(src)
        case "mean" | "avg" => avg(src)
        case "count"      => count(src)
        case "first"      => needOrder(); first(src)
        case "last"       => needOrder(); last(src)
        case other => throw new IllegalArgumentException(
          s"window: unknown function '$other' (have: " +
            s"${(rankFns ++ offsetFns ++ aggFns).toSeq.sorted.mkString(", ")})")
      }
      val spec = w.frameRows match {
        case None => ordered
        case Some(n) =>
          require(aggFns.contains(w.fn),
            s"window: frame_rows only applies to aggregates, not '${w.fn}' " +
              "(rank/lag/lead have positional semantics, not frames)")
          needOrder()
          require(n >= 1,
            s"window: frame_rows must be >= 1 (the trailing row count), got $n")
          ordered.rowsBetween(-(n - 1).toLong, Window.currentRow)
      }
      expr.over(spec).as(w.dest)
    }
    df.select(df.columns.map(col) ++ cols: _*)
  }
}
