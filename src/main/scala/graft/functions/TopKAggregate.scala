package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k heap aggregate: `topk(score, id, k)` ->
  * `array<struct<score: double, id: long>>` sorted by (score desc, id asc).
  *
  * The Spark-native replacement for `ORDER BY score DESC LIMIT k` per group
  * (SURVEY §2.9): with partial aggregation, each map task keeps at most k
  * candidates per group, so a KNN over 10^9 chunks shuffles only
  * |groups| x |map partitions| x k rows instead of every scored row. Ties
  * break on id asc, pinning a total deterministic order (the reference's
  * sort-by `(-score, doc_id, chunk_number)`, `document_service.py:554-690`).
  */
case class TopKAggregate(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  // declared input types: a float score / int id column is cast at analysis
  // instead of the raw asInstanceOf crashing mid-aggregate
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAggregate.entryType, containsNull = false)
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // NaN scores are unordered under < / == — they would never be evicted
    // from the heap AND break the sort comparator's contract, so they are
    // excluded like nulls (a NaN similarity can't rank anywhere meaningful)
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

object TopKAggregate {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Column API: top-k entries by (score desc, id asc) within each group. */
  def top_k(score: Column, id: Column, k: Int): Column =
    toCol(TopKAggregate(toExpr(score), toExpr(id), k)
      .toAggregateExpression())
}

/** Bounded min-heap on (score asc, id desc) so the root is the eviction
  * candidate; full ordering (score desc, id asc) is materialized on eval. */
final class TopKBuffer(val k: Int) {
  private var scores = new Array[Double](math.min(k, 64))
  private var ids = new Array[Long](math.min(k, 64))
  private var size = 0

  // true if (s1,i1) ranks WORSE than (s2,i2) in final order
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, i: Long): Unit = {
    if (size < k) {
      if (size == scores.length) grow()
      scores(size) = s; ids(size) = i
      siftUp(size); size += 1
    } else if (k > 0 && worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def grow(): Unit = {
    val n = math.min(k, scores.length * 2)
    scores = java.util.Arrays.copyOf(scores, n)
    ids = java.util.Arrays.copyOf(ids, n)
  }

  private def siftUp(idx: Int): Unit = {
    var c = idx
    while (c > 0) {
      val p = (c - 1) / 2
      if (worse(scores(c), ids(c), scores(p), ids(p))) {
        swap(c, p); c = p
      } else return
    }
  }

  private def siftDown(idx: Int): Unit = {
    var p = idx
    while (true) {
      val l = 2 * p + 1; val r = l + 1
      var m = p
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == p) return
      swap(p, m); p = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score desc, id asc). */
  def sortedEntries: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    out.sortWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + size * 16)
    bb.putInt(k); bb.putInt(size)
    var i = 0
    while (i < size) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}
