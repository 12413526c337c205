package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Fixed-size character chunks with overlap in one compiled pass — the
 * kernel of TextAnalysis.chunk, replacing the interpreted
 * transform(sequence)-over-substr HOF chain (ArrayTransform is
 * CodegenFallback: one evaluator dispatch per chunk per row).
 *
 * Contract (exactly the grid TextAnalysis.chunk documents and the
 * DuckDB oracle replays; pinned in CurationOpsSpec + the
 * ScalePropertySpec model):
 *  - starts 0, stride, 2·stride, … < numChars (stride = size − overlap);
 *  - chunk i = substringSQL(start+1, size) — CHARACTER counting, same
 *    as Column.substr / SQL substring, never bytes;
 *  - empty string → empty array (the caller's length guard drops
 *    empties before the Generate anyway); null → null.
 */
final case class CharChunks(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression {

  require(size >= 1, s"chunk size must be >= 1, got $size")
  require(overlap >= 0 && overlap < size,
    s"overlap must be in [0, size), got $overlap for size $size")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_chunks needs string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    CharChunks.compute(v.asInstanceOf[UTF8String], size, size - overlap)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = CharChunks.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($v, $size, ${size - overlap});"
    })

  override protected def withNewChildInternal(newChild: Expression): CharChunks =
    copy(child = newChild)

  override def prettyName: String = "char_chunks"
}

object CharChunks {

  /** Compiled chunk grid (called from generated code). */
  def compute(s: UTF8String, size: Int, stride: Int): ArrayData = {
    val chars = s.numChars()
    if (chars == 0) return new GenericArrayData(new Array[Any](0))
    val positions = (chars + stride - 1) / stride
    val out = new Array[Any](positions)
    var i = 0
    var start = 0
    while (start < chars) {
      out(i) = s.substringSQL(start + 1, size)
      i += 1
      start += stride
    }
    new GenericArrayData(out)
  }

  def chunks(text: Column, size: Int, overlap: Int): Column =
    ColumnBridge.column(
      CharChunks(ColumnBridge.expression(text), size, overlap))
}
