package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Gopher duplicate-line fraction in one compiled pass — the kernel of
 * TextAnalysis.dupLineFraction, replacing its interpreted
 * filter(transform(split))+array_distinct chain (ArrayFilter and
 * ArrayTransform are CodegenFallback: an evaluator dispatch per line
 * per pass, plus two intermediate arrays per row).
 *
 * Exact-semantics contract with the HOF form (pinned in
 * TextAnalysisSpec's equivalence case):
 *  - lines = split on '\n'; each line trimmed the way Spark's trim()
 *    trims (ASCII space 0x20 only — NOT Java trim's <= 0x20 rule);
 *  - blank lines drop; ratio = (total − distinct)/total over the
 *    surviving lines, 0.0 when none survive; NULL text → NULL;
 *  - distinctness is exact binary equality of the trimmed lines.
 */
final case class DupLineRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dup_line_ratio needs string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    DupLineRatio.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = DupLineRatio.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): DupLineRatio =
    copy(child = newChild)

  override def prettyName: String = "dup_line_ratio"
}

object DupLineRatio {

  private val NL = UTF8String.fromString("\n")

  /** Compiled kernel (called from generated code). */
  def compute(s: UTF8String): Double = {
    val lines = s.split(NL, -1)
    var total = 0
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < lines.length) {
      val t = lines(i).trim() // UTF8String.trim: ASCII space only
      if (t.numBytes() > 0) {
        total += 1
        seen.add(t)
      }
      i += 1
    }
    if (total <= 0) 0.0
    else (total - seen.size).toDouble / total.toDouble
  }

  def ratio(text: Column): Column =
    ColumnBridge.column(DupLineRatio(ColumnBridge.expression(text)))
}
