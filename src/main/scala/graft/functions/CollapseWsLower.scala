package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Dedup.exactKey's normalization as ONE compiled pass, no regex:
 * lowercase → trim SPACES (0x20 only, the trim() contract) → collapse
 * every maximal \s run {space, \t, \n, \x0B, \f, \r} to a single
 * space. Byte-identical to the
 * `regexp_replace(lower(trim(text)), "\s+", " ")` Column form it
 * replaces (equivalence spec-pinned; the quirks survive deliberately:
 * a leading tab collapses to a LEADING space because only 0x20 is
 * trimmed, and the oracle's trim/regexp replay has the same two-step
 * shape). Lowercasing reuses UTF8String.toLowerCase — the exact
 * method Column lower() calls — so the case fold cannot diverge.
 *
 * Every dedup path runs this normalization corpus-wide (exact keys,
 * dedup_against keys, minhash/ngram shingle bases, simhash tokens,
 * the streaming twins), which is why its regex was worth killing:
 * measured paired (tools/KeyProbe, local[32], 500k docs, md5(key)
 * plans) 0.41 s kernel vs 0.62 s regex vs 0.32 s no-collapse floor.
 */
final case class CollapseWsLower(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collapse_ws_lower needs string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    CollapseWsLower.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CollapseWsLower.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): CollapseWsLower =
    copy(child = newChild)

  override def prettyName: String = "collapse_ws_lower"
}

object CollapseWsLower {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar /* \x0B */ ||
      c == '\f' || c == '\r'

  /** Shared kernel for the interpreted and codegen paths. Replays the
    * Column composition exactly: trim() strips 0x20 only, THEN each
    * maximal \s run — leading/trailing runs of other \s chars
    * included — becomes one 0x20. */
  def compute(s: UTF8String): UTF8String = {
    // identical case fold to Column lower() by construction
    val t = s.toLowerCase.toString
    var i = 0
    var end = t.length
    while (i < end && t.charAt(i) == ' ') i += 1
    while (end > i && t.charAt(end - 1) == ' ') end -= 1
    val sb = new java.lang.StringBuilder(end - i)
    var prevWs = false
    while (i < end) {
      val c = t.charAt(i)
      if (isWs(c)) prevWs = true
      else {
        // a pending run becomes one space — also when LEADING (a
        // leading tab survives the space-only trim and collapses to
        // a leading space, the regex form's exact behavior)
        if (prevWs) sb.append(' ')
        sb.append(c)
        prevWs = false
      }
      i += 1
    }
    if (prevWs) sb.append(' ') // trailing non-space \s run → one space
    UTF8String.fromString(sb.toString)
  }

  def normalize(text: Column): Column =
    ColumnBridge.column(CollapseWsLower(ColumnBridge.expression(text)))
}
