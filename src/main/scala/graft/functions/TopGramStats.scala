package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Per-document word n-gram repetition statistics in one compiled pass —
 * the kernel behind the Gopher-rules repetition signals ("fraction of
 * characters in the most frequent n-gram", "fraction of n-grams that
 * are duplicates"). A per-row hash-count over the token array: no
 * explode, no shuffle, the whole corpus stays a narrow map.
 *
 * Gram positions mirror WordShingles' contract (same window join-with-
 * one-space, nulls skipped concat_ws-style, max(|toks|-n+1, 1)
 * positions so short token lists collapse to one whole-list gram) —
 * but counted NON-distinct: every position contributes.
 *
 * Output struct:
 *  - top_count: occurrences of the most frequent gram;
 *  - top_gram: that gram — ties break to the binary-smallest gram, so
 *    the result is engine-reproducible (DuckDB's default VARCHAR order
 *    is the same binary compare for the ASCII grams the normalizer
 *    emits);
 *  - n_positions: total gram positions;
 *  - dup_positions: positions whose gram occurs more than once.
 * Empty token array → (0, "", 0, 0); null array → null.
 */
final case class TopGramStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("top_count", IntegerType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("n_positions", IntegerType, nullable = false),
    StructField("dup_positions", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_gram_stats needs array<string>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    TopGramStats.compute(v.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = TopGramStats.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($v, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): TopGramStats =
    copy(child = newChild)

  override def prettyName: String = "top_gram_stats"
}

object TopGramStats {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column face over a token array; result is the stats struct. */
  def stats(tokens: Column, n: Int): Column =
    ColumnBridge.column(TopGramStats(ColumnBridge.expression(tokens), n))

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = UTF8String.fromString("")

  /** Compiled counting pass (called from generated code). */
  def compute(xs: ArrayData, n: Int): InternalRow = {
    val size = xs.numElements()
    if (size == 0)
      return new GenericInternalRow(Array[Any](0, EMPTY, 0, 0))
    val positions = math.max(size - (n - 1), 1)
    val counts = new java.util.HashMap[UTF8String, Int](positions * 2)
    var i = 0
    while (i < positions) {
      val end = math.min(i + n, size)
      var parts: List[UTF8String] = Nil
      var j = end - 1
      while (j >= i) {
        if (!xs.isNullAt(j)) parts = xs.getUTF8String(j) :: parts
        j -= 1
      }
      val gram = UTF8String.concatWs(SPACE, parts: _*)
      counts.merge(gram, 1, (a, b) => a + b)
      i += 1
    }
    var topGram: UTF8String = null
    var topCount = 0
    var dup = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > 1) dup += c
      if (c > topCount ||
          (c == topCount && e.getKey.compareTo(topGram) < 0)) {
        topCount = c
        topGram = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](topCount, topGram, positions, dup))
  }
}
