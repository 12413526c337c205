package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Cosine-argmax cell assignment in ONE narrow pass — the codegen'd kernel
 * behind `Similarity.assignCells` (r21). Given a corpus vector and the
 * full centroid table packed into a single array<struct<cell:long,
 * cvec:array<numeric>>> column (one broadcast row), returns the `cell`
 * the old cross-join + groupBy(id) + max(struct(sim, cell)) plan would
 * have picked — but with NO row blow-up, NO sort, and NO exchange of the
 * corpus: the assignment becomes a per-row compiled loop over cells ×
 * dimensions, the plan a bare Project over the scan.
 *
 * Semantics are EXACTLY the grouped form's (pinned per-row against
 * `Similarity.assignCellsGrouped` in AssignCellsSpec, including every
 * degenerate case below), so gate hashes cannot move:
 *  - per centroid, sim = cosine(vec, cvec) with the identical float-op
 *    order: na2 = dot(v,v), nb2 = dot(c,c) (ArrayDot accumulation:
 *    elements cast to double, products summed left-to-right),
 *    d = sqrt(na2)*sqrt(nb2); d == 0 → sim = 0.0 (even when the dot
 *    itself would be null — `when` short-circuits first); null vector /
 *    null element / length mismatch → sim = null;
 *  - the winner is max over struct(sim, cell) in Spark's SQL ordering:
 *    null sim smallest, NaN largest, -0.0 == 0.0 (SQLOrderingUtil's
 *    rule), ties on sim resolved to the LARGER cell — so an all-null-sim
 *    row (e.g. a null vector) still assigns to the max cell id, exactly
 *    as the grouped max did;
 *  - a null cells array (never produced by assignCells) → null.
 *
 * The per-row loop lives in one compiled Scala method invoked from
 * whole-stage codegen via a reference object — one virtual call per row,
 * amortized over cells × dim arithmetic (the same budget class as a
 * catalyst StaticInvoke), with no interpreter dispatch per element and
 * no CodegenFallback node splitting the codegen span.
 */
final case class BestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(_: NumericType, _),
            ArrayType(StructType(Array(f0, f1)), _)) =>
        f0.dataType == LongType && (f1.dataType match {
          case ArrayType(_: NumericType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "best_cell needs (array<numeric>, array<struct<cell:bigint, cvec:array<numeric>>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private lazy val vecElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val cvecElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType](1).dataType.asInstanceOf[ArrayType].elementType

  private def numAt(ad: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => ad.getFloat(i).toDouble
    case DoubleType  => ad.getDouble(i)
    case IntegerType => ad.getInt(i).toDouble
    case LongType    => ad.getLong(i).toDouble
    case ShortType   => ad.getShort(i).toDouble
    case ByteType    => ad.getByte(i).toDouble
    case d: DecimalType => ad.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"best_cell: unsupported element $other")
  }

  /** dot(a, b) with ArrayDot's exact semantics: double accumulation in
    * index order; null on length mismatch or any null element. Boxed so
    * null propagates like the SQL expression it replaces. */
  private def dot(a: ArrayData, ta: DataType, b: ArrayData, tb: DataType): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += numAt(a, i, ta) * numAt(b, i, tb)
      i += 1
    }
    acc
  }

  /** SQL double total order: -0.0 == 0.0, NaN largest (SQLOrderingUtil). */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** The per-row loop. `vecVal` may be null (a null corpus vector keeps
    * the grouped form's all-null-sim behavior: max cell wins). Returns a
    * boxed Long (the winning cell) or null. */
  def route(vecVal: Any, cellsArr: ArrayData): java.lang.Long = {
    val vec = vecVal.asInstanceOf[ArrayData]
    val na2: java.lang.Double =
      if (vec == null) null else dot(vec, vecElem, vec, vecElem)
    val n = cellsArr.numElements()
    var found = false
    var bestSim: java.lang.Double = null
    var bestCell: java.lang.Long = null
    var i = 0
    while (i < n) {
      // a null array element cannot arise from collect_list(struct(...));
      // treated as struct(null, null) for totality
      val st = if (cellsArr.isNullAt(i)) null else cellsArr.getStruct(i, 2)
      val cell: java.lang.Long =
        if (st == null || st.isNullAt(0)) null else st.getLong(0)
      val cvec: ArrayData =
        if (st == null || st.isNullAt(1)) null else st.getArray(1)
      val sim: java.lang.Double =
        if (na2 == null || cvec == null) null
        else {
          val nb2 = dot(cvec, cvecElem, cvec, cvecElem)
          if (nb2 == null) null
          else {
            val d = math.sqrt(na2.doubleValue()) * math.sqrt(nb2.doubleValue())
            if (d == 0.0) java.lang.Double.valueOf(0.0)
            else {
              val ab = dot(vec, vecElem, cvec, cvecElem)
              if (ab == null) null else java.lang.Double.valueOf(ab.doubleValue() / d)
            }
          }
        }
      // struct(sim, cell) ascending, nulls first, max wins; strict-greater
      // keeps the incumbent on full ties (content-identical either way)
      val wins =
        if (!found) true
        else {
          val simCmp =
            if (sim == null && bestSim == null) 0
            else if (sim == null) -1
            else if (bestSim == null) 1
            else cmpDouble(sim.doubleValue(), bestSim.doubleValue())
          if (simCmp != 0) simCmp > 0
          else {
            if (cell == null && bestCell == null) false
            else if (cell == null) false
            else if (bestCell == null) true
            else cell.longValue() > bestCell.longValue()
          }
        }
      if (wins) { found = true; bestSim = sim; bestCell = cell }
      i += 1
    }
    if (!found) null else bestCell
  }

  override def eval(input: InternalRow): Any = {
    val cellsVal = right.eval(input)
    if (cellsVal == null) null
    else {
      val r = route(left.eval(input), cellsVal.asInstanceOf[ArrayData])
      if (r == null) null else r.longValue()
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = left.genCode(ctx)
    val cellsGen = right.genCode(ctx)
    val ref = ctx.addReferenceObj("bestCell", this, classOf[BestCell].getName)
    val r = ctx.freshName("r")
    ev.copy(code = code"""
      ${vecGen.code}
      ${cellsGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${cellsGen.isNull}) {
        java.lang.Long $r = $ref.route(
          ${vecGen.isNull} ? null : (Object) ${vecGen.value}, ${cellsGen.value});
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCell =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "best_cell"
}

object BestCell {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API face: argmax-by-cosine cell over a packed centroid array. */
  def best(vec: Column, cells: Column): Column =
    ColumnBridge.column(
      BestCell(ColumnBridge.expression(vec), ColumnBridge.expression(cells)))
}
