package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded TOP-K (smallest first) over `(ord: long, payload: long)` pairs
  * as a native Catalyst aggregate — the distributed top-k shape a window
  * `row_number() ≤ k` cannot express efficiently.
  *
  * The window plan must SHUFFLE AND SORT every candidate row (the geo_knn
  * ring join emits ~590M candidates at sf30 — the sort spilled and the
  * wall went superlinear). This aggregate keeps a k-bounded buffer per
  * group with PARTIAL AGGREGATION: each map task reduces its candidates
  * to ≤ k rows per local group before the exchange, so the shuffle
  * carries O(groups × k) rows instead of O(candidates) — the 100 TB
  * shape for "k nearest / k best per key".
  *
  * Ordering is lexicographic (ord, payload) ascending — ties break on
  * payload, deterministically. NULL structs and NULL fields are skipped.
  * eval() returns `array<struct<ord: long, payload: long>>` ascending;
  * `posexplode` turns it into ranked rows. */
case class TopKPairs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]]
  with UnaryLike[Expression] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType), StructField("payload", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b)) if a.dataType == LongType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_pairs expects struct<long, long>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  /** insert keeping the buffer ASCENDING and capped at k — O(k) per row,
    * k is small by contract (neighbor counts, not result sets). */
  private def insert(buf: mutable.ArrayBuffer[(Long, Long)], v: (Long, Long)): Unit = {
    if (buf.size == k) {
      val last = buf(k - 1)
      if (v._1 > last._1 || (v._1 == last._1 && v._2 >= last._2)) return
    }
    var i = buf.size
    while (i > 0 && {
      val p = buf(i - 1)
      v._1 < p._1 || (v._1 == p._1 && v._2 < p._2)
    }) i -= 1
    buf.insert(i, v)
    if (buf.size > k) buf.remove(k)
  }

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) insert(buf, (r.getLong(0), r.getLong(1)))
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Long, Long)],
                     b: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.map(p => InternalRow(p._1, p._2)).toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, p) => out.writeLong(o); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKPairs =
    copy(child = newChild)
}

object TopKPairs {
  import org.apache.spark.sql.GraftColumnBridge

  /** `topKPairs(struct(ordCol, payloadCol), k)` as an aggregate Column. */
  def topKPairs(entry: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKPairs(GraftColumnBridge.expression(entry), k).toAggregateExpression())
}
