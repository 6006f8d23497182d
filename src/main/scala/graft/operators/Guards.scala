package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Input-schema guards shared by the exact-integer operators.
  *
  * The registry's correctness story rests on every emitted measure being
  * exact integer arithmetic — which silently breaks if a caller hands a
  * fractional column to an operator that `cast('long')`s it (the r12
  * poissonBootstrap advice item: a ratio in [0,1] truncates to 0/1 and
  * the statistic is computed over garbage with no error). These guards
  * make that a LOUD schema-time failure with the fixed-point remedy in
  * the message, instead of a wrong number.
  */
object Guards {

  /** The column must already be integral (fixed-point fractional inputs
    * first: floor(value·10^d), the cuped convention). Boolean is
    * accepted where stated: it casts to exact 0/1. */
  def requireIntegral(df: DataFrame, colName: String, op: String,
                      acceptBoolean: Boolean = false): Unit =
    df.schema(colName).dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case BooleanType if acceptBoolean => ()
      case other => throw new IllegalArgumentException(
        s"$op: column '$colName' is ${other.simpleString} — pass an " +
          "integral column (fixed-point fractional values first, e.g. " +
          "floor(value*1e6); a silent cast('long') would truncate)")
    }

  /** Exact wide-decimal value → int64, loudly (the r14 e24/e27/gr8
    * lesson): registry outputs must be int64-class — engines stringify
    * int128/decimal(38,0) differently, so an uncast wide column passes
    * rows+schema and fails the driver's hash. An operator that computes
    * in decimal(38,0) for exactness emits through this guard — in range
    * it is a plain cast; out of range it RAISES with the value in the
    * message instead of Spark's silent non-ANSI null-on-overflow. */
  def loudInt64(c: org.apache.spark.sql.Column, op: String,
                what: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(abs(c) <= lit(new java.math.BigDecimal(Long.MaxValue)),
      c.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$op: $what exceeds int64 (widen the fixed-point scale or "
          + "emit a bounded ratio instead): "), c.cast("string"))))
  }

  /** The column must be a string — operators that md5/concat a key or
    * propagate it as a label would otherwise depend on each engine's
    * number→string formatting (1 vs 1.0), a silent cross-engine drift. */
  def requireString(df: DataFrame, colName: String, op: String): Unit = {
    val dt = df.schema(colName).dataType
    if (dt != StringType) throw new IllegalArgumentException(
      s"$op: column '$colName' is ${dt.simpleString} — pass a STRING " +
        "(cast explicitly; implicit number→string formatting is " +
        "engine-specific and would drift the hashes/labels)")
  }
}
