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
 *  - rows where the predicate evaluates to NULL go to `fail` (pandas masks
 *    have no three-valued logic; a null comparison is falsy there) — we
 *    coalesce the compiled predicate to false to match.
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

  /** Compile a rule tree to a Catalyst predicate (three-valued). */
  def compile(rule: Rule): Column = rule match {
    case Leaf(c, op, v) =>
      val col0 = col(c)
      (op, v) match {
        case ("==", vs: Seq[_])  => col0.isin(vs: _*)
        case ("==", x)           => col0 === lit(x)
        case ("!=", x)           => col0 =!= lit(x)
        case (">", x)            => col0 > lit(x)
        case ("<", x)            => col0 < lit(x)
        case (">=", x)           => col0 >= lit(x)
        case ("<=", x)           => col0 <= lit(x)
        case ("contains", x) =>
          // case-insensitive, literal (non-regex) substring, null-safe false
          coalesce(lower(col0).contains(lower(lit(x.toString))), lit(false))
        case (other, _) => throw new IllegalArgumentException(s"unknown operator: $other")
      }
    case Node(lo, rules) => lo.toUpperCase match {
      case "AND" => rules.map(compile).reduce(_ && _)
      case "OR"  => rules.map(compile).reduce(_ || _)
      case "NOT" =>
        require(rules.size == 1, s"NOT takes exactly 1 rule, got ${rules.size}")
        !compile(rules.head)
      case other => throw new IllegalArgumentException(s"unknown logical operator: $other")
    }
  }

  /** Two-valued predicate: NULL ⇒ false, matching reference row/mask behavior. */
  def predicate(rule: Rule): Column = coalesce(compile(rule), lit(false))

  /** pass/fail routing. fail = complement of pass (nulls land in fail). */
  def apply(df: DataFrame, rule: Rule): Map[String, DataFrame] = {
    val p = predicate(rule)
    Map("pass" -> df.filter(p), "fail" -> df.filter(!p))
  }
}
