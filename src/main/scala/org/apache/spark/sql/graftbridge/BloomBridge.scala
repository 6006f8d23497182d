package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's internal Bloom-filter expressions (the machinery behind
  * runtime row-group filtering, `InjectRuntimeFilter`): a distributed
  * `BloomFilterAggregate` build plus a codegen'd `BloomFilterMightContain`
  * probe. Spark ships no public Column API for these; re-exporting them here
  * (same extension-library pattern as [[ColumnBridge]]) keeps membership
  * probes inside whole-stage codegen instead of a boxed UDF over a broadcast
  * sketch.
  *
  * Contract: `value` must be an `xxhash64(...)` LongType column on BOTH the
  * build and probe side (that is the hash the aggregate buffers internally —
  * mirroring how `InjectRuntimeFilter` wraps the key in `XxHash64`). The
  * bloom side of the probe must be a constant (collected sketch bytes):
  * Spark's analyzer rejects a non-foldable, non-subquery bloom input.
  */
object BloomBridge {
  /** Aggregate a LongType (xxhash64) column into serialized Bloom-filter
    * bytes. `numBits` sizes the sketch: optimal is
    * `-n·ln(fpp)/ln(2)²` for n expected items. */
  def bloomAgg(value: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(BloomFilterAggregate(
      ExpressionUtils.expression(value),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Membership probe of an xxhash64 column against collected sketch bytes
    * (no false negatives; false-positive rate set by the build). */
  def mightContain(value: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes), ExpressionUtils.expression(value)))
}
