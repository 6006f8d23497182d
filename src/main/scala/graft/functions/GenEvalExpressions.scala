package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the token-overlap statistics behind BLEU/ROUGE (ev1)
  * and TextTiling cohesion (c5). These counts were first written as
  * higher-order-function folds; HOFs evaluate INTERPRETED with no common
  * subexpression elimination, and the x64 probe measured the per-row cost
  * dominating the whole query (~95 s at sf0.1 for ev1). Same cure as the
  * winnow/CDC kernels: one plain-JVM pass per row behind a codegen'd
  * static call — the statistic is a pure integer count, so the oracle's
  * SQL replay is untouched.
  *
  * [[clippedCount]] is Σ_g min(count_a(g), count_b(g)) — the multiset
  * intersection size. [[bleuClipped]] computes it for word n-grams of
  * order 1..4 in ONE pass over the two token arrays (grams keyed by a
  * string join, counts in an open JDK HashMap), returning [m1, m2, m3,
  * m4] — the BLEU modified-precision / ROUGE-N numerators. */
object GenEvalExpressions {

  /** Multiset intersection size of two UTF8String arrays. O(|a|+|b|). */
  def clippedCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](na * 2)
    var i = 0
    while (i < na) {
      val s = a.getUTF8String(i)
      val c = counts.get(s)
      counts.put(s, if (c == null) 1 else c + 1)
      i += 1
    }
    var m = 0L; var j = 0
    while (j < nb) {
      val s = b.getUTF8String(j)
      val c = counts.get(s)
      if (c != null && c > 0) { m += 1L; counts.put(s, c - 1) }
      j += 1
    }
    m
  }

  /** Clipped n-gram matches for n = 1..4 between candidate and reference
    * token arrays, one pass each. Grams are space-joined token windows —
    * the same gram identity the oracle's `array_to_string(list_slice)`
    * builds. */
  def bleuClipped(cand: ArrayData, ref: ArrayData): ArrayData = {
    val out = new Array[Any](4)
    var n = 1
    while (n <= 4) {
      out(n - 1) = clippedCount(grams(cand, n), grams(ref, n))
      n += 1
    }
    new GenericArrayData(out)
  }

  private def grams(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    if (n == 1) return toks
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i + n <= len) {
      val sb = new java.lang.StringBuilder()
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + o).toString)
        o += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  case class ClippedOverlap(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = LongType
    override def prettyName: String = "clipped_overlap"
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def nullSafeEval(a: Any, b: Any): Any =
      clippedCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = graft.functions.GenEvalExpressions.clippedCount($a, $b);
        """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class BleuClipped(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bleu_clipped"
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def nullSafeEval(a: Any, b: Any): Any =
      bleuClipped(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = graft.functions.GenEvalExpressions.bleuClipped($a, $b);
        """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def clipped_overlap_kernel(a: Column, b: Column): Column =
    toCol(ClippedOverlap(toExpr(a), toExpr(b)))

  def bleu_clipped(cand: Column, ref: Column): Column =
    toCol(BleuClipped(toExpr(cand), toExpr(ref)))

  /** Longest common subsequence LENGTH of two token arrays — the ROUGE-L
    * statistic (Lin 2004 §3). Classic two-row DP, O(|a|·|b|) time and
    * O(|b|) space; the reference side is pre-extracted once so the inner
    * cell does one UTF8String equality, never an ArrayData fetch. Same
    * kernel rationale as [[clippedCount]]: a HOF-fold formulation would
    * re-evaluate its input subtrees per DP cell (interpreted, no CSE). */
  def lcsLength(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    val bs = new Array[UTF8String](m)
    var k = 0
    while (k < m) { bs(k) = b.getUTF8String(k); k += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai.equals(bs(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }

  /** chrF statistics (Popović 2015): over the SPACE-STRIPPED character
    * sequences of candidate and reference, the clipped char-n-gram match
    * count for n = 1..6. Returns [c_chars, r_chars, m1..m6] — the
    * denominators max(len−n+1, 0) are derivable from the two lengths, so
    * eight longs carry the whole statistic. One HashMap pass per order. */
  def chrfStats(cand: UTF8String, ref: UTF8String): ArrayData = {
    val cs = cand.toString.replace(" ", "")
    val rs = ref.toString.replace(" ", "")
    val out = new Array[Any](8)
    out(0) = cs.length.toLong
    out(1) = rs.length.toLong
    var n = 1
    while (n <= 6) {
      out(1 + n) = clippedChars(cs, rs, n)
      n += 1
    }
    new GenericArrayData(out)
  }

  private def clippedChars(a: String, b: String, n: Int): Long = {
    if (a.length < n || b.length < n) return 0L
    val counts = new java.util.HashMap[String, Integer](a.length * 2)
    var i = 0
    while (i + n <= a.length) {
      val g = a.substring(i, i + n)
      val c = counts.get(g)
      counts.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    var m = 0L; var j = 0
    while (j + n <= b.length) {
      val g = b.substring(j, j + n)
      val c = counts.get(g)
      if (c != null && c > 0) { m += 1L; counts.put(g, c - 1) }
      j += 1
    }
    m
  }

  case class LcsLength(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = LongType
    override def prettyName: String = "lcs_length"
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def nullSafeEval(a: Any, b: Any): Any =
      lcsLength(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = graft.functions.GenEvalExpressions.lcsLength($a, $b);
        """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class ChrfStats(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "chrf_stats"
    override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
    override def nullSafeEval(a: Any, b: Any): Any =
      chrfStats(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = graft.functions.GenEvalExpressions.chrfStats($a, $b);
        """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def lcs_length(a: Column, b: Column): Column =
    toCol(LcsLength(toExpr(a), toExpr(b)))

  def chrf_stats(cand: Column, ref: Column): Column =
    toCol(ChrfStats(toExpr(cand), toExpr(ref)))

  /** Squared SMART-lnc document norm: Σ_t (1 + ln tf_t)² over the token
    * array's term histogram, folded in ASCENDING TERM ORDER (binary
    * UTF8 compare — the same order DuckDB's `list(... ORDER BY term)`
    * replays), summed left-to-right from 0.0, ln via StrictMath (what
    * Spark's own `log` evaluates, so the kernel is bit-identical to the
    * sort_array run-length HOF fold it replaces — n15's first draft,
    * which evaluated interpreted with per-element boxing, the ev1
    * pathology). One HashMap pass + one sort of the DISTINCT terms
    * (vocabulary-per-doc-sized, not token-sized). */
  def lncNormSq(toks: ArrayData): Double = {
    val n = toks.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      val c = counts.get(s)
      counts.put(s, if (c == null) 1 else c + 1)
      i += 1
    }
    val terms = counts.keySet().toArray(new Array[UTF8String](counts.size()))
    java.util.Arrays.sort(terms.asInstanceOf[Array[Object]])
    var acc = 0.0; var j = 0
    while (j < terms.length) {
      val w = 1.0 + StrictMath.log(counts.get(terms(j)).doubleValue())
      acc += w * w
      j += 1
    }
    acc
  }

  case class LncNormSq(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ImplicitCastInputTypes {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "lnc_norm_sq"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def nullSafeEval(a: Any): Any =
      lncNormSq(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.GenEvalExpressions.lncNormSq($a);
        """)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def lnc_norm_sq(toks: Column): Column = toCol(LncNormSq(toExpr(toks)))

  /** Key-ordered IEEE double summation over a collected
    * array<struct<k, p: double>> — the static kernel behind
    * [[ordered_sum]], replacing the repo's most common interpreted-HOF
    * shape `aggregate(sort_array(collect_list(struct(k, p))), 0.0,
    * (a, x) => a + x.p)` (the n15 lesson, generalized: HOF lambdas
    * evaluate interpreted with per-element boxing; this is one compiled
    * JVM pass per row). The sort mirrors sort_array's struct ordering
    * exactly — lexicographic (k, then p), with java.lang compare
    * semantics for doubles — so the summation ORDER, and therefore the
    * bit pattern the oracles replay via `list_sum(... ORDER BY k)`, is
    * unchanged. Any null element or null field returns null, matching
    * the HOF's null-propagating fold. keyKind: 0 = long-backed (long/
    * int/short/byte), 1 = string, 2 = double. */
  def orderedSum(arr: ArrayData, keyKind: Int): java.lang.Double = {
    val n = arr.numElements()
    if (n == 0) return java.lang.Double.valueOf(0.0)
    val ks = new Array[Any](n)
    val ps = new Array[Double](n)
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val row = arr.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1)) return null
      ks(i) = keyKind match {
        case 0 => row.getLong(0)
        case 1 => row.getUTF8String(0)
        case _ => row.getDouble(0)
      }
      ps(i) = row.getDouble(1)
      idx(i) = Integer.valueOf(i)
      i += 1
    }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = keyKind match {
          case 0 => java.lang.Long.compare(ks(a).asInstanceOf[Long],
            ks(b).asInstanceOf[Long])
          case 1 => ks(a).asInstanceOf[UTF8String]
            .compareTo(ks(b).asInstanceOf[UTF8String])
          case _ => java.lang.Double.compare(ks(a).asInstanceOf[Double],
            ks(b).asInstanceOf[Double])
        }
        if (c != 0) c else java.lang.Double.compare(ps(a), ps(b))
      }
    })
    var s = 0.0
    var j = 0
    while (j < n) { s += ps(idx(j)); j += 1 }
    java.lang.Double.valueOf(s)
  }

  case class OrderedSum(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    private lazy val keyKind: Int = child.dataType match {
      case ArrayType(StructType(fields), _) => fields(0).dataType match {
        case LongType | IntegerType | ShortType | ByteType => 0
        case StringType => 1
        case DoubleType => 2
        case other => throw new IllegalArgumentException(
          s"ordered_sum: unsupported key type ${other.simpleString}")
      }
      case other => throw new IllegalArgumentException(
        s"ordered_sum needs array<struct<k, p: double>>, got " +
          other.simpleString)
    }
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields(1).dataType == DoubleType &&
            (fields(0).dataType match {
              case LongType | IntegerType | ShortType | ByteType |
                   StringType | DoubleType => true
              case _ => false
            }) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"ordered_sum needs array<struct<orderableKey, double>>, " +
              s"got ${other.simpleString}")
      }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "ordered_sum"
    override def nullSafeEval(a: Any): Any =
      orderedSum(a.asInstanceOf[ArrayData], keyKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val resultTerm = ctx.freshName("orderedSum")
      nullSafeCodeGen(ctx, ev, a => s"""
        java.lang.Double $resultTerm =
          graft.functions.GenEvalExpressions.orderedSum($a, $keyKind);
        if ($resultTerm == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $resultTerm.doubleValue(); }
        """)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Σ p over the array's structs in (k, p)-ascending order — a drop-in
    * for `aggregate(sort_array(collect_list(struct(k, p))), 0.0,
    * (a, x) => a + x.p)` with identical ordering and IEEE adds. */
  def ordered_sum(pairs: Column): Column = toCol(OrderedSum(toExpr(pairs)))

  /** One-pass token statistics over an array<string> (r17 optimization
    * round): n = size, nd = |distinct|, top = max multiplicity, chars =
    * Σ length(token) in CHARACTERS (Spark `length` semantics). Replaces
    * the interpreted-HOF formulation in [[graft.operators.Corpus
    * .repetitionMetrics]] whose `top` fold was O(n·distinct) boxed
    * comparisons per row (for each distinct token, a full filter pass) —
    * value-identical: same UTF8String equality, same long arithmetic,
    * empty array → all zeros, null array → null struct (the caller
    * coalesces exactly as before). */
  def tokenStats(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    val counts = new java.util.HashMap[UTF8String, Long]()
    var chars = 0L
    var top = 0L
    var i = 0
    var nulls = 0
    while (i < n) {
      // null tokens (impossible from the repo's tokenizers — regex split
      // never yields null elements — but possible from arbitrary callers):
      // count toward n and once toward nd like the replaced HOF's
      // size/array_distinct did, never toward top (x === null filtered to
      // nothing there), and contribute 0 chars instead of the old fold's
      // null-poisoning — the struct stays non-nullable and the kernel
      // cannot NPE (r17 advisor finding).
      if (a.isNullAt(i)) { nulls += 1 }
      else {
        val t = a.getUTF8String(i)
        chars += t.numChars()
        val c = counts.getOrDefault(t, 0L) + 1L
        counts.put(t, c)
        if (c > top) top = c
      }
      i += 1
    }
    val nd = counts.size.toLong + (if (nulls > 0) 1L else 0L)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, nd, top, chars))
  }

  case class TokenStats(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ImplicitCastInputTypes {
    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("nd", LongType, nullable = false),
      StructField("top", LongType, nullable = false),
      StructField("chars", LongType, nullable = false)))
    override def prettyName: String = "token_stats"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def nullSafeEval(a: Any): Any =
      tokenStats(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.GenEvalExpressions.tokenStats($a);
        """)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def token_stats(toks: Column): Column = toCol(TokenStats(toExpr(toks)))
}
