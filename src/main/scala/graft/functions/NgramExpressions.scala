package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled n-gram window kernels (r18 optimization round, guide §4-analog).
  *
  * The shingle builders in [[text]] were bind-once higher-order-function
  * compositions — correct, and immune to the re-evaluation pathology, but
  * still INTERPRETED per element: every gram position paid a boxed
  * `Substring`/`ConcatWs` expression eval plus a `sequence` index array.
  * t34's char-trigram explode alone measured ~30 s of task time at sf0.1
  * (OptProbe), dominated by exactly this. Each kernel below is one plain
  * JVM pass per row behind a codegen'd static call, value-identical to the
  * HOF it replaces (R18KernelSpec gates old-vs-new equality, including
  * non-BMP text, duplicate-preserving vs distinct forms, and short/empty
  * inputs):
  *
  *  - [[charNgrams]]: all char n-grams of a string in code-point windows —
  *    the byte offsets of code points are computed ONCE (the naive
  *    `UTF8String.substring` walks from byte 0 per call, O(len²) over a
  *    document), each gram is a zero-copy slice over one shared byte
  *    array; `distinct` keeps first occurrences in window order exactly
  *    like `array_distinct`.
  *  - [[wordShingles]]: space-joined token windows via
  *    `UTF8String.concatWs` (the same null-skipping join `concat_ws`
  *    performs), `distinct` as above.
  *  - [[wordShinglesMulti]]: every rung of a shingle ladder from ONE
  *    token-array extraction, preserving word_shingles_multi's
  *    array<struct<rung, gs>> layout.
  *
  * Null inputs never reach the kernels: the [[text]] wrappers coalesce the
  * normalized string / token array to empty first, which reproduces the
  * old `when(...).otherwise(array())` null behavior (null text yielded an
  * EMPTY gram array, not null).
  */
object NgramExpressions {

  private val SPACE = UTF8String.fromString(" ")

  /** Byte offsets of each code-point start, plus the terminal length —
    * one O(bytes) walk, shared by every window slice. */
  private def cpOffsets(b: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](b.length + 1)
    var n = 0
    var o = 0
    while (o < b.length) {
      offs(n) = o
      n += 1
      o += UTF8String.numBytesForFirstByte(b(o))
    }
    offs(n) = b.length
    java.util.Arrays.copyOf(offs, n + 1)
  }

  def charNgrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val b = s.getBytes
    val offs = cpOffsets(b)
    val total = (offs.length - 1) - n + 1
    if (total <= 0) return new GenericArrayData(new Array[Any](0))
    if (!distinct) {
      val out = new Array[Any](total)
      var i = 0
      while (i < total) {
        out(i) = UTF8String.fromBytes(b, offs(i), offs(i + n) - offs(i))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < total) {
        seen.add(UTF8String.fromBytes(b, offs(i), offs(i + n) - offs(i)))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]]
        .asInstanceOf[Array[Any]])
    }
  }

  def wordShingles(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val ts = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val total = m - n + 1
    if (!distinct) {
      val out = new Array[Any](total)
      i = 0
      while (i < total) {
        out(i) = UTF8String.concatWs(SPACE,
          java.util.Arrays.copyOfRange(ts, i, i + n): _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      i = 0
      while (i < total) {
        seen.add(UTF8String.concatWs(SPACE,
          java.util.Arrays.copyOfRange(ts, i, i + n): _*))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]]
        .asInstanceOf[Array[Any]])
    }
  }

  def wordShinglesMulti(toks: ArrayData, ns: Array[Int],
                        distinct: Boolean): ArrayData = {
    val rungs = new Array[Any](ns.length)
    var r = 0
    while (r < ns.length) {
      rungs(r) = InternalRow(ns(r).toLong, wordShingles(toks, ns(r), distinct))
      r += 1
    }
    new GenericArrayData(rungs)
  }

  /** Per-document top-`m` char n-grams by (count desc, gram asc) with
    * their 1-based rank — the langIdTrained doc-profile statistic computed
    * IN-ROW. The dataflow equivalent (explode every gram position →
    * groupBy(id, gram) count → row_number window per id → filter ≤ m)
    * shuffles and sorts the full gram stream (~100M rows at sf0.1, ~35 s
    * of task time measured) to keep 50 rows per doc; a doc's grams all
    * live in its own row, so the whole statistic is one hash-count pass +
    * one bounded heap per row, no exchange at all. Value-identical: gram
    * order is UTF8String binary order (= Spark's string sort = the
    * oracle's), rank = row_number over (count desc, gram asc). */
  def topGrams(s: UTF8String, n: Int, m: Int): ArrayData = {
    val b = s.getBytes
    val offs = cpOffsets(b)
    val total = (offs.length - 1) - n + 1
    if (total <= 0) return new GenericArrayData(new Array[Any](0))
    val counts = new java.util.HashMap[UTF8String, Long]()
    var i = 0
    while (i < total) {
      val g = UTF8String.fromBytes(b, offs(i), offs(i + n) - offs(i))
      counts.merge(g, 1L, (a, c) => a + c)
      i += 1
    }
    // bounded heap, root = WORST in final (count desc, gram asc) order
    val worstFirst = new java.util.Comparator[(UTF8String, Long)] {
      def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(a._2, b._2)         // smaller count = worse
        if (c != 0) c else b._1.compareTo(a._1)            // larger gram = worse
      }
    }
    val heap = new java.util.PriorityQueue[(UTF8String, Long)](
      math.min(m + 1, counts.size + 1), worstFirst)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      heap.add((e.getKey, e.getValue))
      if (heap.size > m) heap.poll()
    }
    val k = heap.size
    val sorted = new Array[(UTF8String, Long)](k)
    var j = k - 1
    while (j >= 0) { sorted(j) = heap.poll(); j -= 1 }
    val out = new Array[Any](k)
    j = 0
    while (j < k) {
      out(j) = InternalRow(sorted(j)._1, (j + 1).toLong)
      j += 1
    }
    new GenericArrayData(out)
  }

  case class TopGramsByCount(child: Expression, n: Int, m: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1 && m >= 1, s"top_grams needs n,m >= 1 (got $n, $m)")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("gram", StringType, nullable = false),
      StructField("drank", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "top_grams"
    override def nullSafeEval(v: Any): Any =
      topGrams(v.asInstanceOf[UTF8String], n, m)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => s"""
        ${ev.value} = graft.functions.NgramExpressions.topGrams($s, $n, $m);
        """)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def top_grams(c: Column, n: Int, m: Int): Column =
    toCol(TopGramsByCount(toExpr(c), n, m))

  case class CharNgrams(child: Expression, n: Int, distinct: Boolean)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1, s"char_ngrams needs n >= 1 (got $n)")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "char_ngrams"
    override def nullSafeEval(v: Any): Any =
      charNgrams(v.asInstanceOf[UTF8String], n, distinct)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => s"""
        ${ev.value} = graft.functions.NgramExpressions.charNgrams($s, $n, $distinct);
        """)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class WordShingles(child: Expression, n: Int, distinct: Boolean)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1, s"word_shingles needs n >= 1 (got $n)")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles_k"
    override def nullSafeEval(v: Any): Any =
      wordShingles(v.asInstanceOf[ArrayData], n, distinct)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.NgramExpressions.wordShingles($a, $n, $distinct);
        """)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class WordShinglesMulti(child: Expression, ns: Seq[Int],
                               distinct: Boolean)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(ns.nonEmpty && ns.forall(_ >= 1),
      s"word_shingles_multi needs nonempty positive rungs (got $ns)")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("rung", LongType, nullable = false),
      StructField("gs", ArrayType(StringType, containsNull = false),
        nullable = false))), containsNull = false)
    override def prettyName: String = "word_shingles_multi_k"
    private val nsArr: Array[Int] = ns.toArray
    override def nullSafeEval(v: Any): Any =
      wordShinglesMulti(v.asInstanceOf[ArrayData], nsArr, distinct)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val nsRef = ctx.addReferenceObj("shingleRungs", nsArr, "int[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.NgramExpressions.wordShinglesMulti($a, $nsRef, $distinct);
        """)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def char_ngrams(c: Column, n: Int, distinct: Boolean): Column =
    toCol(CharNgrams(toExpr(c), n, distinct))
  def word_shingles_k(toks: Column, n: Int, distinct: Boolean): Column =
    toCol(WordShingles(toExpr(toks), n, distinct))
  def word_shingles_multi_k(toks: Column, ns: Seq[Int], distinct: Boolean): Column =
    toCol(WordShinglesMulti(toExpr(toks), ns, distinct))
}
