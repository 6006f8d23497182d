package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003)
  * — the MOSS fingerprinting scheme: hash every character k-gram, slide a
  * w-window over the hash sequence, keep the RIGHTMOST minimum of each
  * window, deduplicate consecutive selections. The winnowing guarantee:
  * any substring match of length ≥ w+k−1 between two documents shares at
  * least one selected fingerprint, at expected density 2/(w+1) — position-
  * robust local dedup/plagiarism evidence that md5-whole-doc fingerprints
  * (text.fingerprint) can't give and MinHash gives only set-wise.
  *
  * Engine-replayable by construction: codepoint values (both engines' view
  * of a char), polynomial rolling hash mod the prime 2^31−1 with base 131
  * — all exact long arithmetic — and the rightmost-tie rule, so a DuckDB
  * oracle recomputes the identical (position, hash) set with O(n·k) list
  * ops while this Expression runs O(n): one rolling-hash pass and one
  * monotonic-deque sweep (amortized O(1) per window), inside whole-stage
  * codegen via a static JVM kernel (the same eval both paths — no
  * interpreted fallback, no UDF). Documents shorter than one full window
  * (0 < #hashes < w) yield the rightmost minimum over all their hashes —
  * one fingerprint, never zero, for any doc with ≥ k chars (stated
  * contract; both engines implement it identically).
  *
  * Output packs (pos, hash) as pos·2^31 + hash (hash < 2^31−1, so the
  * low 31 bits hold it exactly): one BIGINT per fingerprint, unpacked
  * downstream with exact integer div/mod — array<struct> costs more to
  * shuffle and is harder to replay in SQL.
  */
object WinnowExpressions {

  val HashBase = 131L
  val HashMod = 2147483647L // 2^31 − 1, prime
  val PosPack = 2147483648L // 2^31

  /** The O(n) kernel: rolling k-gram hashes + monotonic-deque window
    * minima (rightmost on ties), consecutive selections deduplicated.
    * Static so generated code and interpreted eval share one body. */
  def winnowPacked(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val str = s.toString
    // codepoint stream (what DuckDB's unicode() sees per char)
    val codes = new Array[Long](str.codePointCount(0, str.length))
    var ci = 0; var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      codes(ci) = cp.toLong; ci += 1
      off += Character.charCount(cp)
    }
    val n = ci
    val nh = n - k + 1
    if (nh <= 0) return Array.emptyLongArray
    // bk1 = base^(k−1) mod M for the rolling subtract
    var bk1 = 1L
    var i = 0
    while (i < k - 1) { bk1 = bk1 * HashBase % HashMod; i += 1 }
    val h = new Array[Long](nh)
    var acc = 0L
    i = 0
    while (i < k) { acc = (acc * HashBase + codes(i)) % HashMod; i += 1 }
    h(0) = acc
    i = 1
    while (i < nh) {
      acc = ((acc + HashMod - codes(i - 1) * bk1 % HashMod) % HashMod *
        HashBase + codes(i + k - 1)) % HashMod
      h(i) = acc
      i += 1
    }
    val dq = new Array[Int](nh)
    var head = 0; var tail = 0
    val out = new Array[Long](nh)
    var no = 0; var last = -1
    i = 0
    while (i < nh) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      while (dq(head) < i - w + 1) head += 1
      if (i >= w - 1 || i == nh - 1) {
        val sel = dq(head)
        if (sel != last) { out(no) = sel.toLong * PosPack + h(sel); no += 1; last = sel }
      }
      i += 1
    }
    if (no == out.length) out else java.util.Arrays.copyOf(out, no)
  }

  /** winnow_fingerprints(text) -> array<bigint> of pos·2^31 + hash, pos
    * ascending. `k`/`w` are plan-time constants (part of the operator
    * configuration, like a tokenizer's vocab — not data). */
  case class WinnowFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k >= 1 && w >= 1, s"winnow needs k>=1, w>=1 (got k=$k, w=$w)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fingerprints"
    override def inputTypes: Seq[DataType] = Seq(StringType)

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(winnowPacked(input.asInstanceOf[UTF8String], k, w))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val arr = ctx.freshName("fps")
        s"""
        long[] $arr = graft.functions.WinnowExpressions.winnowPacked($c, $k, $w);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper over the normalized-or-raw text the caller chooses. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    toCol(WinnowFingerprints(toExpr(text), k, w))
}
