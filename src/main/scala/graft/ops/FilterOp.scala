package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Filter operator: routes rows to `pass`/`fail` ports by a boolean rule tree.
 *
 * Semantics mirror the reference predicate language (reference:
 * src/etl_core/components/data_operations/filter/comparison_rule.py:32-80 and
 * receivers/data_operations_receivers/filter/filter_helper.py:57-214):
 *  - leaf operators: == != > < >= <= contains
 *  - `==` with a list value means membership (isin)
 *  - `contains` is case-insensitive substring with null → false
 *  - node operators: AND / OR / NOT (NOT arity exactly 1)
 *  - null handling happens at each LEAF, not at the tree root: pandas masks
 *    have no three-valued logic, so each leaf is two-valued and the
 *    NOT/AND/OR algebra above it is plain boolean algebra. For ==, <, >,
 *    <=, >=, contains a null value is falsy (contains uses na=False; NaN
 *    comparisons evaluate False), so NOT(x > 5) with x = null is True and
 *    routes to `pass`. The ONE truthy exception is `!=`: pandas `s != v`
 *    evaluates True for NaN/None rows (NaN != v is True), so a null row
 *    PASSES a `!=` leaf (filter_helper.py:81-82, and the AND-of-!= →
 *    ~isin rewrite at :148-151 behaves identically: NaN is never isin).
 *    We compile `!=` as IsNull(col) OR col =!= v to match.
 *
 * The reference's micro-rewrites (OR-of-== → isin, etc., filter_helper.py:
 * 104-151) are intentionally dropped: Catalyst's OptimizeIn + boolean
 * simplification do this during optimization.
 *
 * Scale notes: the compiled predicate is a plain Catalyst Column, so it is
 * pushed into the scan (PushedFilters for parquet) and stays inside
 * whole-stage codegen. When both ports are consumed, the input should be
 * cached by the graph layer — the operator itself stays lazy.
 */
object FilterOp {

  sealed trait Rule
  final case class Leaf(column: String, op: String, value: Any) extends Rule
  final case class Node(logical: String, rules: Seq[Rule]) extends Rule

  /** Compile a rule tree to a two-valued Catalyst predicate. Each leaf is
    * `IsNotNull(col) AND cmp` rather than `coalesce(cmp, false)`: the two
    * are equivalent (null column → false, never null, since Spark's AND
    * short-circuits false && null = false), but only the conjunct form
    * reaches the parquet scan as PushedFilters — a coalesce wrapper
    * blocks row-group skipping entirely. `!=` is the dual — IsNull(col) OR
    * col =!= v — which parquet still pushes as Or(IsNull, Not(EqualTo)).
    * Comparison values are non-null literals from config; a null value
    * compiles to constant false (pandas: any comparison mask against None
    * is all-False) except `!=`, where pandas `s != None` is all-True. */
  def compile(rule: Rule): Column = rule match {
    case Leaf(c, op, v) =>
      val col0 = col(c)
      (op, v) match {
        case ("!=", null) => lit(true)
        case (_, null) => lit(false)
        case ("==", vs: Seq[_]) =>
          val nonNull = vs.filter(_ != null)
          if (nonNull.isEmpty) lit(false)
          else col0.isNotNull && col0.isin(nonNull: _*)
        case ("==", x)           => col0.isNotNull && (col0 === lit(x))
        case ("!=", x)           => col0.isNull || (col0 =!= lit(x))
        case (">", x)            => col0.isNotNull && (col0 > lit(x))
        case ("<", x)            => col0.isNotNull && (col0 < lit(x))
        case (">=", x)           => col0.isNotNull && (col0 >= lit(x))
        case ("<=", x)           => col0.isNotNull && (col0 <= lit(x))
        case ("contains", x) =>
          // case-insensitive, literal (non-regex) substring
          col0.isNotNull && lower(col0).contains(lower(lit(x.toString)))
        case (other, _) => throw new IllegalArgumentException(s"unknown operator: $other")
      }
    case Node(lo, rules) => lo.toUpperCase match {
      case "AND" | "OR" if rules.isEmpty =>
        throw new IllegalArgumentException(
          s"$lo needs at least 1 rule (empty 'rules' list in config)")
      case "AND" => rules.map(compile).reduce(_ && _)
      case "OR"  => rules.map(compile).reduce(_ || _)
      case "NOT" =>
        require(rules.size == 1, s"NOT takes exactly 1 rule, got ${rules.size}")
        !compile(rules.head)
      case other => throw new IllegalArgumentException(s"unknown logical operator: $other")
    }
  }

  /** Alias for compile — the compiled tree is already two-valued. */
  def predicate(rule: Rule): Column = compile(rule)

  /** pass/fail routing. fail = complement of pass (nulls land in fail). */
  def apply(df: DataFrame, rule: Rule): Map[String, DataFrame] = {
    val p = predicate(rule)
    Map("pass" -> df.filter(p), "fail" -> df.filter(!p))
  }
}
