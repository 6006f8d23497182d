package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** First-fit-decreasing bin packing as a native kernel — the utilization
  * upgrade over greedy sequential packing (t15's cumulative-offset form
  * wastes the tail of every bin a long doc doesn't fit; FFD places each
  * item, longest first, into the FIRST bin with room, the classic 11/9·OPT
  * guarantee). The caller delivers lengths ALREADY in packing order
  * (desc, with its own tiebreak); the kernel is the O(n·bins) first-fit
  * scan — a per-shard sequential decision that no window or join
  * expresses, same kernel-expression reasoning as [[WinnowExpressions]].
  * Items longer than the budget get a bin of their own (stated, not
  * silent). Returns 0-based bin ids aligned with the input order. */
object PackExpressions {

  def ffdBins(lengths: ArrayData, budget: Long): Array[Long] = {
    val n = lengths.numElements()
    val out = new Array[Long](n)
    val loads = new java.util.ArrayList[Long]()
    var i = 0
    while (i < n) {
      val len = lengths.getLong(i)
      var b = 0
      var placed = false
      while (!placed && b < loads.size()) {
        if (len <= budget && loads.get(b) + len <= budget) {
          loads.set(b, loads.get(b) + len); out(i) = b.toLong; placed = true
        }
        b += 1
      }
      if (!placed) { loads.add(len); out(i) = (loads.size() - 1).toLong }
      i += 1
    }
    out
  }

  case class FfdPack(child: Expression, budget: Long)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(budget >= 1, s"ffd_pack needs budget>=1 (got $budget)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ffd_pack"
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType, containsNull = false))

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(ffdBins(input.asInstanceOf[ArrayData], budget))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.PackExpressions.ffdBins($c, ${budget}L));
        """)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def ffd_pack(lengths: Column, budget: Long): Column =
    toCol(FfdPack(toExpr(lengths), budget))
}
