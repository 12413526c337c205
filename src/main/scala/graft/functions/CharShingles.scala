package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Distinct character n-gram shingles of a string in one compiled pass —
 * replacing Dedup.shingles's interpreted transform over an index
 * sequence (one interpreted substr per character position per row).
 *
 * Exact-semantics contract with the HOF form (pinned in
 * WordShinglesSpec over the real documents fixture):
 *  - shingle at 1-based char position i = substr(i, n), for
 *    i in 1..max(numChars-(n-1), 1) — the final partial window of an
 *    n-1-char-short text appears as substr's natural clamp, and an
 *    EMPTY string yields [""] (one substr over nothing);
 *  - substr counts CHARACTERS (UTF8String.substringSQL), not bytes —
 *    CJK text shingles identically to the builtin;
 *  - distinct keeps first-occurrence order (array_distinct);
 *  - null string → [null], a single-null-element array, NOT a null
 *    array: the HOF's sequence bound is greatest(length(null)-(n-1), 1)
 *    and greatest SKIPS nulls, so one substr(null) element survives
 *    (measured — WordShinglesSpec pins it).
 */
final case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingles needs string, got ${other.sql}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) CharShingles.oneNull
    else CharShingles.compute(v.asInstanceOf[UTF8String], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val nullRef = ctx.addReferenceObj("oneNull", CharShingles.oneNull,
      classOf[ArrayData].getName)
    val cls = CharShingles.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        |${c.code}
        |final ${CodeGenerator.javaType(dataType)} ${ev.value} =
        |  ${c.isNull} ? $nullRef : $cls.compute(${c.value}, $n);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)

  override def prettyName: String = "char_shingles"
}

object CharShingles {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column face. */
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), n))

  /** Null-text result: one null element (see class doc). */
  val oneNull: ArrayData = new GenericArrayData(Array[Any](null))

  /** Compiled shingling (called from generated code). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val chars = s.numChars()
    val positions = math.max(chars - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    while (i <= positions) {
      seen.add(s.substringSQL(i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
