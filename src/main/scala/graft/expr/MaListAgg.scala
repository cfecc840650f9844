package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered LISTAGG as a native Catalyst aggregate — the multi-active
  * hashdiff's `LISTAGG(row_str, ',') WITHIN GROUP (ORDER BY ma_keys)`
  * (reference `hash_standardization.sql:1215-1287`).
  *
  * `child` is a struct `(k0, …, kn, s: string)`; NULL structs are skipped
  * (LISTAGG's null-skipping). eval() sorts the group by the struct's
  * native-typed interpreted ordering — identical to `array_sort` on the same
  * struct — and concatenates the last field with ','. Empty group → NULL.
  *
  * Scale/memory contract vs `sort_array(collect_list(struct))`:
  *  - partial aggregation still applies (merge of per-partition buffers),
  *    and the buffer stores compact UnsafeRow copies rather than an
  *    array-of-structs Column value that is materialized twice (collect →
  *    sort → transform);
  *  - memory is O(largest (hashkey, ldts) group) — the same inherent bound
  *    as LISTAGG itself, since the OUTPUT is the whole ordered group. A
  *    hot-key group large enough to spill should be capped upstream (the
  *    reference shares this failure mode).
  */
case class MaListAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val numFields = structType.length
  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "ma_list_agg"

  /** SQL users reach this via `ma_list_agg(...)` (GraftExtensions): a
    * non-struct argument or a struct whose LAST field is not a string must
    * fail analysis, not throw ClassCastException mid-execution.
    *
    * NULL ma-key fields sort FIRST (Spark's interpreted ordering); engines
    * whose LISTAGG defaults to NULLS LAST diverge byte-wise on NULL ma
    * keys — normalize NULL keys upstream if byte parity matters. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case st: StructType if st.nonEmpty && st.fields.last.dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ma_list_agg expects a struct((ma keys)*, payload string) argument " +
            s"whose last field is STRING, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[InternalRow] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[InternalRow], input: InternalRow): mutable.ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[InternalRow].copy()
    buf
  }

  override def merge(a: mutable.ArrayBuffer[InternalRow], b: mutable.ArrayBuffer[InternalRow]): mutable.ArrayBuffer[InternalRow] = {
    a ++= b
    a
  }

  override def eval(buf: mutable.ArrayBuffer[InternalRow]): Any =
    if (buf.isEmpty) null
    else {
      val sorted = buf.sortWith((x, y) => ordering.compare(x, y) < 0)
      val parts = sorted.collect {
        case r if !r.isNullAt(numFields - 1) => r.getUTF8String(numFields - 1)
      }
      if (parts.isEmpty) null
      else UTF8String.concatWs(UTF8String.fromString(","), parts.toSeq: _*)
    }

  override def serialize(buf: mutable.ArrayBuffer[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val bytes = proj(r).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(numFields)
      row.pointTo(b, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MaListAgg =
    copy(child = newChild)
}
