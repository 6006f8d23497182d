package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index as a native expression. A pure-Column fold over the
  * rotation levels is semantically fine but structurally explosive: each
  * level's (x, y) reference the previous level's MULTIPLE times, so the
  * inlined `when` tree grows ~5^bits and an 8-bit fold alone blew the
  * driver heap at analysis. The kernel form is the same O(bits) loop the
  * textbook writes, inside whole-stage codegen via a static call (the
  * [[WinnowExpressions]] pattern), with the DuckDB replay generated as a
  * LINEAR CTE chain instead (one named step per level — SQL's equivalent
  * of naming intermediates). */
object LayoutExpressions {

  /** Classic iterative xy2d (reflect+swap rotation per level). */
  def hilbertXy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn; var y = yIn; var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression with ImplicitCastInputTypes {
    require(bits >= 1 && bits <= 31, s"hilbert needs bits in [1,31] (got $bits)")
    override def dataType: DataType = LongType
    override def prettyName: String = "hilbert_index"
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

    override def nullSafeEval(a: Any, b: Any): Any =
      hilbertXy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = graft.functions.LayoutExpressions.hilbertXy2d($a, $b, $bits);
        """)

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def hilbert_index(a: Column, b: Column, bits: Int): Column =
    toCol(HilbertIndex(toExpr(a.cast("long")), toExpr(b.cast("long")), bits))
}
