package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst array expressions for the span-removal hot path.
  *
  * [[Dedup.removeDupSpans]] (the ExactSubstr transform, Lee et al. 2022
  * arXiv:2107.06499 §3; reference signal in
  * `morphik_rust/src/text_ops.rs`-class span hashing) must drop every token
  * whose position is covered by a non-owned duplicated span. The naive
  * Column form — `filter(tk, (t, j) => !array_contains(covered, j))` — is an
  * interpreted HOF doing a linear scan of `covered` per token:
  * O(|tokens| × |covered|) per document, which a fully-duplicated 100k-token
  * web doc turns into ~1e10 comparisons inside one task. At 100 TB with
  * unchunked crawl docs, doc length is the adversary, so the bound has to be
  * linear in it.
  *
  * [[RemoveAtSortedPositions]] makes it linear: both the token index stream
  * (0..n-1 by construction) and the covered set (array_sort'd once at the
  * aggregation, O(c log c) in span count, not token count) are ascending, so
  * one merged two-pointer sweep filters the whole document in O(n + c).
  * Implemented with full `doGenCode` so the rebuild projection stays inside
  * whole-stage codegen next to the md5 span hashing.
  */
object ArrayExpressions {

  /** remove_at_sorted_positions(Array[String] tokens, Array[Long] positions)
    * -> Array[String]: tokens whose 0-based index does NOT appear in
    * `positions`. REQUIRES `positions` sorted ascending (duplicates are
    * tolerated — the pointer just skips them; out-of-range entries are
    * ignored). Null-strict; order-preserving. The positions array must be
    * non-null-ELEMENT typed (containsNull=false) — enforced at analysis,
    * because a null slot would read as 0 under getLong and, with array_sort
    * placing nulls LAST, silently break the ascending precondition; the
    * natural builders (sequence/flatten/array_distinct/array_sort over
    * sequence output) all produce containsNull=false. */
  case class RemoveAtSortedPositions(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "remove_at_sorted_positions"
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType), ArrayType(LongType, containsNull = false))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val tok = a.asInstanceOf[ArrayData]
      val pos = b.asInstanceOf[ArrayData]
      val n = tok.numElements(); val m = pos.numElements()
      val tmp = new Array[Any](n)
      var p = 0; var kept = 0; var j = 0
      while (j < n) {
        while (p < m && pos.getLong(p) < j) p += 1
        if (!(p < m && pos.getLong(p) == j)) {
          tmp(kept) = tok.get(j, StringType); kept += 1
        }
        j += 1
      }
      if (kept == n) new GenericArrayData(tmp)
      else new GenericArrayData(java.util.Arrays.copyOf(
        tmp.asInstanceOf[Array[AnyRef]], kept).asInstanceOf[Array[Any]])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (tok, pos) => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val j = ctx.freshName("j"); val p = ctx.freshName("p")
        val kept = ctx.freshName("kept"); val tmp = ctx.freshName("tmp")
        val outArr = ctx.freshName("outArr")
        s"""
        int $n = $tok.numElements();
        int $m = $pos.numElements();
        Object[] $tmp = new Object[$n];
        int $p = 0; int $kept = 0;
        for (int $j = 0; $j < $n; $j++) {
          while ($p < $m && $pos.getLong($p) < $j) $p++;
          if ($p < $m && $pos.getLong($p) == $j) continue;
          $tmp[$kept++] = $tok.isNullAt($j) ? null : $tok.getUTF8String($j);
        }
        Object[] $outArr = ($kept == $n) ? $tmp : java.util.Arrays.copyOf($tmp, $kept);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($outArr);
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column wrapper: tokens minus the (sorted, ascending) positions. */
  def removeAtSortedPositions(tokens: Column, sortedPositions: Column): Column =
    toCol(RemoveAtSortedPositions(toExpr(tokens), toExpr(sortedPositions)))
}
