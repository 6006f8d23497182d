package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC — the LBFS/rsync boundary scheme applied
  * to text): a chunk boundary falls wherever the rolling hash of the last
  * `k` codepoints ≡ 0 (mod `divisor`), so boundaries are a function of
  * LOCAL CONTENT, not position. An insertion early in a document shifts
  * every fixed-size chunk after it (c1's failure mode for storage-level
  * dedup) but leaves all CDC boundaries outside the edited neighborhood
  * in place — the property dedup-friendly chunk stores are built on.
  * Expected chunk length ≈ `divisor`; a `maxLen` backstop splits
  * boundary-free runs at exact `maxLen` offsets (closed-form, no
  * sequential state — unlike a MIN-length rule, which would make each
  * boundary depend on the previous one and is deliberately omitted so
  * the whole layout replays in non-recursive SQL).
  *
  * Same replay discipline as [[WinnowExpressions]]: codepoint stream,
  * polynomial rolling hash mod 2³¹−1 base 131 (shared constants, so the
  * two kernels can't drift), all exact long arithmetic. k is capped at 5
  * because the oracle's unrolled Σ cpᵢ·131^j terms must stay inside
  * BIGINT for any Unicode codepoint — the kernel mods every step and has
  * no such limit, but an unreplayable parameter point is not offered.
  * O(n) per document, map-only, inside whole-stage codegen via the
  * static kernel. Output: the chunk substrings, in order; empty text →
  * empty array. */
object CdcExpressions {

  import WinnowExpressions.{HashBase, HashMod}

  /** The O(n) kernel: rolling k-gram hash → content cuts → maxLen fill →
    * codepoint-exact substring slices. Static so generated and
    * interpreted eval share one body. */
  def cdcChunks(s: UTF8String, k: Int, divisor: Long, maxLen: Int): ArrayData = {
    val str = s.toString
    val nChars = str.length
    val codes = new Array[Long](str.codePointCount(0, nChars))
    val offs = new Array[Int](codes.length + 1)
    var ci = 0; var off = 0
    while (off < nChars) {
      val cp = str.codePointAt(off)
      codes(ci) = cp.toLong; offs(ci) = off; ci += 1
      off += Character.charCount(cp)
    }
    offs(ci) = nChars
    val n = ci
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // content-defined cuts: chunk starts at i+k when the k-gram starting
    // at i hashes to 0 mod divisor (0 < start < n)
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n >= k) {
      var bk1 = 1L
      var i = 0
      while (i < k - 1) { bk1 = bk1 * HashBase % HashMod; i += 1 }
      var acc = 0L
      i = 0
      while (i < k) { acc = (acc * HashBase + codes(i)) % HashMod; i += 1 }
      if (acc % divisor == 0L && k < n) cuts += k
      i = 1
      while (i <= n - k) {
        acc = ((acc + HashMod - codes(i - 1) * bk1 % HashMod) % HashMod *
          HashBase + codes(i + k - 1)) % HashMod
        if (acc % divisor == 0L && i + k < n) cuts += (i + k)
        i += 1
      }
    }
    // maxLen backstop: fill every boundary-free run at exact maxLen steps
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var prev = 0
    var cIdx = 0
    while (cIdx <= cuts.length) {
      val c = if (cIdx < cuts.length) cuts(cIdx) else n
      var p = prev
      while (c - p > maxLen) { p += maxLen; starts += p }
      if (c < n) starts += c
      prev = c
      cIdx += 1
    }
    val out = new Array[Any](starts.length)
    var j = 0
    while (j < starts.length) {
      val a = starts(j)
      val b = if (j + 1 < starts.length) starts(j + 1) else n
      out(j) = UTF8String.fromString(str.substring(offs(a), offs(b)))
      j += 1
    }
    new GenericArrayData(out)
  }

  case class CdcChunks(child: Expression, k: Int, divisor: Long, maxLen: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k >= 2 && k <= 5,
      s"cdc_chunks needs k in [2,5] (oracle-replayable band; got $k)")
    require(divisor >= 2, s"cdc_chunks needs divisor>=2 (got $divisor)")
    require(maxLen >= 1, s"cdc_chunks needs maxLen>=1 (got $maxLen)")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "cdc_chunks"
    override def inputTypes: Seq[DataType] = Seq(StringType)

    override def nullSafeEval(v: Any): Any =
      cdcChunks(v.asInstanceOf[UTF8String], k, divisor, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.CdcExpressions.cdcChunks($a, $k, ${divisor}L, $maxLen);
        """)

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def cdc_chunks(text: Column, k: Int, divisor: Long, maxLen: Int): Column =
    toCol(CdcChunks(toExpr(text), k, divisor, maxLen))
}
