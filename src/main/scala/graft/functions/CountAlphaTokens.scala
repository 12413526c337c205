package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Count of whitespace tokens containing at least one Unicode letter —
 * gopherRules' alpha-word numerator as ONE compiled char loop, no
 * regex. Replaces two measured-slower formulations (CurationProbe,
 * local[32], 500k docs = 27.6M tokens): the interpreted per-token
 * `size(filter(toks, _ rlike \p{L}))` lambda at 0.41 s (ArrayFilter is
 * CodegenFallback, and each token pays a regex match) and the compiled
 * `regexp_count(text, \S*\p{L}\S*)` single pass at 0.60 s (codegen'd
 * but regex-engine-bound — slower than even the interpreted lambda:
 * scanning every token through the regex engine costs more than the
 * lambda's dispatch). The char loop pays neither bill: 0.23 s.
 *
 * Contract (equivalence with the HOF form pinned in CurationOpsSpec):
 *  - a TOKEN is a maximal run of non-whitespace, whitespace being
 *    exactly the Java regex \s class {space, \t, \n, \x0B, \f, \r} —
 *    the same boundaries as split(text, "\s+") (NBSP etc. are token
 *    chars on both sides);
 *  - a token counts iff it contains >= 1 code point in Unicode
 *    category L (Character.isLetter == \p{L}: Lu/Ll/Lt/Lm/Lo),
 *    decoded code-point-wise so supplementary-plane letters count;
 *  - null → null; empty/blank text → 0.
 */
final case class CountAlphaTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_alpha_tokens needs string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    CountAlphaTokens.countOf(v.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CountAlphaTokens.countOf($v.toString());")

  override protected def withNewChildInternal(newChild: Expression): CountAlphaTokens =
    copy(child = newChild)

  override def prettyName: String = "count_alpha_tokens"
}

object CountAlphaTokens {


  /** Shared kernel for the interpreted and codegen paths. One pass:
    * track in-token/has-letter, decode a code point only while the
    * current token is still letterless (a letter found skips decoding
    * for the token's remainder). */
  def countOf(s: String): Int = {
    val n = s.length
    var i = 0
    var count = 0
    var inTok = false
    var hasLetter = false
    while (i < n) {
      val c = s.charAt(i)
      if (Ws.isWs(c)) {
        if (inTok && hasLetter) count += 1
        inTok = false
        hasLetter = false
        i += 1
      } else {
        inTok = true
        if (!hasLetter) {
          val cp = s.codePointAt(i)
          if (Character.isLetter(cp)) hasLetter = true
          i += Character.charCount(cp)
        } else i += 1
      }
    }
    if (inTok && hasLetter) count += 1
    count
  }

  def count(text: Column): Column =
    ColumnBridge.column(CountAlphaTokens(ColumnBridge.expression(text)))
}
