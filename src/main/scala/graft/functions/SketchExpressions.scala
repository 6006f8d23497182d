package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe side of count-min-sketch pipelines. Spark ships the BUILD side as
  * the `count_min_sketch` SQL aggregate (binary sketch out) but no probe
  * expression — so estimates would otherwise need a driver-side loop or a
  * boxed UDF. [[CmsEstimateLong]] closes the gap: the serialized sketch
  * rides the expression as a constant (same shipping model as
  * `BloomFilterMightContain`'s literal), deserialized once per task via a
  * transient lazy, then each row costs `depth` hash-and-min lookups.
  *
  * Longs only, by design: hashing the probe key to `xxhash64` BEFORE both
  * the build aggregate and the probe keeps the sketch's item encoding
  * trivially identical on both sides (string-vs-binary encoding drift
  * inside the sketch library can't bite). A 64-bit pre-hash collision just
  * merges two counters — an overestimate, which CMS already is.
  */
object SketchExpressions {

  case class CmsEstimateLong(sketchBytes: Array[Byte], child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "cms_estimate"

    @transient private lazy val sketch: CountMinSketch =
      CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

    override def nullSafeEval(v: Any): Any =
      sketch.estimateCount(java.lang.Long.valueOf(v.asInstanceOf[Long]))

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Estimated count of an xxhash64 LongType column against a serialized
    * count-min sketch built over the same hash. */
  def cms_estimate(hashed: Column, sketchBytes: Array[Byte]): Column =
    toCol(CmsEstimateLong(sketchBytes, toExpr(hashed)))
}
