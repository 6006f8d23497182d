package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernel for additive Holt–Winters triple exponential smoothing
  * (Winters 1960; Hyndman & Athanasopoulos FPP3 §8.3) — the sequential
  * per-key recursion behind [[graft.operators.Features.holtWinters]].
  * The recursion has genuine per-step state (level, trend, and the
  * period-length seasonal vector all feed every next step), so unlike
  * CUSUM there is no prefix identity to distribute on; but the input is
  * the (keys × days)-bounded daily grid — the e23 state law — so ONE
  * compiled JVM pass per key over ≤ span days is the right shape, not a
  * window and not an interpreted HOF fold.
  *
  * All arithmetic is exact long fixed-point in milli units with
  * TRUNCATING division (toward zero — Scala `/`, Spark `div`, DuckDB
  * `//` agree; the seasonalDecompose statement), smoothing weights in
  * ppm, so the oracle's recursive-CTE replay is bit-identical:
  *   fc_t    = l + b + s[t mod m]                      (t ≥ m)
  *   resid_t = 1000·x_t − fc_t
  *   l'      = (α·(1000·x_t − s[p]) + (10⁶−α)·(l+b)) quot 10⁶
  *   b'      = (β·(l'−l) + (10⁶−β)·b) quot 10⁶
  *   s[p]'   = (γ·(1000·x_t − l − b) + (10⁶−γ)·s[p]) quot 10⁶
  * seeded (stated, the FPP3-simplified init) from the first season:
  * l₀ = (Σ_{t<m} 1000·x_t) quot m, b₀ = 0, s_t = 1000·x_t − l₀; the
  * first m rows emit NULL forecast/residual/state (the pre-model edge,
  * e23's honest-NULL convention). Inputs are bounded loudly at
  * |1000·x| ≤ 10¹⁵; the per-step ppm PRODUCTS run in BigInt (this layer
  * is (keys × days)-bounded — the e23 law — so the boxing cost is
  * nothing, and a long-only α·X would cap the daily magnitude at
  * ~2·10¹², which real x64-scale rollups exceed), with every stored
  * state back in an exact long (bounded by the input magnitude:
  * level/seasonal are damped combinations of the x's, trend of their
  * deltas). */
object ForecastExpressions {

  def holtWinters(arr: ArrayData, alphaPpm: Long, betaPpm: Long,
                  gammaPpm: Long, period: Int): ArrayData = {
    val n = arr.numElements()
    require(n >= period + 1,
      s"holt_winters needs > period=$period grid rows per key (got $n) - " +
        "the seed season IS the model init; widen the span")
    val di = new Array[Long](n)
    val xm = new Array[Long](n)
    val idx = Array.tabulate(n)(Integer.valueOf)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      require(!row.isNullAt(0) && !row.isNullAt(1),
        "holt_winters: null day/value in the grid - the daily grid " +
          "fills gaps with explicit zeros, a null upstream is a bug")
      di(i) = row.getLong(0)
      val x = Math.multiplyExact(row.getLong(1), 1000L)
      require(math.abs(x) <= 1000000000000000L,
        s"holt_winters: |milli value| $x past 1e15 - exceeds the exact " +
          "arithmetic headroom; rescale upstream")
      xm(i) = x
      i += 1
    }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int =
        java.lang.Long.compare(di(a), di(b))
    })
    // (w·a + (10**6−w)·b) quot 10**6 with BigInt intermediates: BigInteger
    // division truncates toward zero, matching Spark div / DuckDB //
    def mix(w: Long, a: Long, b: Long): Long =
      ((BigInt(w) * a + BigInt(1000000L - w) * b) / 1000000L).toLong
    val m = period
    var l = 0L
    var t = 0
    while (t < m) { l += xm(idx(t)); t += 1 }
    l = l / m
    var b = 0L
    val s = new Array[Long](m)
    t = 0
    while (t < m) { s(t) = xm(idx(t)) - l; t += 1 }
    val out = new Array[Any](n)
    t = 0
    while (t < m) {
      out(t) = new GenericInternalRow(
        Array[Any](di(idx(t)), xm(idx(t)) / 1000L, null, null, null, null))
      t += 1
    }
    while (t < n) {
      val x = xm(idx(t))
      val p = t % m
      val fc = l + b + s(p)
      val resid = x - fc
      val nl = mix(alphaPpm, x - s(p), l + b)
      val nb = mix(betaPpm, nl - l, b)
      s(p) = mix(gammaPpm, x - l - b, s(p))
      l = nl
      b = nb
      out(t) = new GenericInternalRow(
        Array[Any](di(idx(t)), x / 1000L, fc, resid, l, b))
      t += 1
    }
    new GenericArrayData(out)
  }

  private val OutElem = StructType(Seq(
    StructField("di", LongType, nullable = false),
    StructField("x_centi", LongType, nullable = false),
    StructField("fc_milli", LongType, nullable = true),
    StructField("resid_milli", LongType, nullable = true),
    StructField("level_milli", LongType, nullable = true),
    StructField("trend_milli", LongType, nullable = true)))

  case class HoltWinters(child: Expression, alphaPpm: Long, betaPpm: Long,
                         gammaPpm: Long, period: Int)
      extends UnaryExpression {
    for ((w, nm) <- Seq((alphaPpm, "alpha"), (betaPpm, "beta"),
                        (gammaPpm, "gamma")))
      require(w >= 0 && w <= 1000000,
        s"holt_winters needs $nm in [0, 1e6] ppm (got $w)")
    require(period >= 2 && period <= 366,
      s"holt_winters needs period in [2, 366] (got $period)")
    override def dataType: DataType = ArrayType(OutElem, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "holt_winters"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StructType(fs), _)
          if fs.length == 2 && fs.forall(_.dataType == LongType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"holt_winters needs array<struct<bigint, bigint>>, got " +
              other.simpleString)
      }
    override def nullSafeEval(a: Any): Any =
      holtWinters(a.asInstanceOf[ArrayData], alphaPpm, betaPpm, gammaPpm,
        period)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.ForecastExpressions.holtWinters(
          $a, ${alphaPpm}L, ${betaPpm}L, ${gammaPpm}L, $period);
        """)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Per-key Holt–Winters pass over a collected (di, x) day array. */
  def holt_winters(grid: Column, alphaPpm: Long, betaPpm: Long,
                   gammaPpm: Long, period: Int): Column =
    toCol(HoltWinters(toExpr(grid), alphaPpm, betaPpm, gammaPpm, period))
}
