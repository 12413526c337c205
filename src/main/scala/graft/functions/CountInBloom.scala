package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Count of string-array elements that MIGHT belong to a Bloom filter —
 * CountInSet's sketch-backed sibling for probe sets too large to ship
 * as an exact hash set (the decontamination `bloom` strategy: ~12 bits
 * per element at 1% FPR vs the exact set's full string payload).
 *
 * Count semantics are one-sided, inherited from the sketch: no false
 * NEGATIVES (an element in the builder's set always counts), so
 * `count == 0` proves NO element belongs — the property the bloom
 * prefilter is built on. A nonzero count may be inflated by false
 * positives and is a candidate signal, never an exact overlap.
 *
 * Null contract mirrors CountInSet (CountInBloomSpec pins both): null
 * array → null; null elements don't count; exact binary UTF8 equality
 * (the filter hashes the UTF-8 bytes both at build and probe time).
 *
 * The filter ships in the task closure like CountInSet's set — at 1%
 * FPR a 2M-gram benchmark is ~3 MB, far below the point where a
 * Broadcast handle would matter; codegen references it once per stage.
 */
final case class CountInBloom(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_in_bloom needs array<string>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) &&
        bloom.mightContainBinary(xs.getUTF8String(i).getBytes)) count += 1
      i += 1
    }
    count
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bloomRef = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |final int $n = $v.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i) &&
         |      $bloomRef.mightContainBinary($v.getUTF8String($i).getBytes())) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountInBloom =
    copy(child = newChild)

  override def prettyName: String = "count_in_bloom"
}

object CountInBloom {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column face: how many elements of `tokens` MIGHT be in `bloom`. */
  def count(tokens: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(CountInBloom(ColumnBridge.expression(tokens), bloom))
}
