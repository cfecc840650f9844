package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType}

/** Native codegen'd vector arithmetic for the similarity-search operators.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)`
  * — which allocates a zipped intermediate array and invokes lambda closures
  * per element — with a tight fused loop inside whole-stage codegen. The
  * fold order is IDENTICAL (sequential, left-to-right, double accumulator),
  * so results are bit-for-bit the same as the higher-order-function form and
  * the DuckDB oracle's list_sum(list_transform(list_zip(...))).
  *
  * NULL semantics: NULL if either input array is NULL, and NULL on a length
  * mismatch (zip_with null-pads the shorter side and the NULL poisons the
  * whole fold — a partial dot product would be silently wrong); array
  * elements are assumed non-null (embeddings).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // ALWAYS nullable: a length mismatch yields NULL even when both children
  // are non-nullable — without this override nullSafeCodeGen binds ev.isNull
  // to the literal `false` and the generated `false = true;` cannot compile
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects numeric arrays, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "dot_product"

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch: zip_with null-pads and the NULL poisons the whole
    // fold — mirror that with a NULL result, never a partial dot product
    if (x.numElements() != y.numElements()) null
    else {
      val gx = VectorExpressions.getter(leftElem)
      val gy = VectorExpressions.getter(rightElem)
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) { acc += gx(x, i) * gy(y, i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gx = VectorExpressions.genGetter(leftElem)
    val gy = VectorExpressions.genGetter(rightElem)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${gx(x, i)} * ${gy(y, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over integral arrays (the quantized-index coarse
  * scorer): exact long arithmetic — no rounding step exists downstream, so
  * this MUST stay integral end-to-end. Same fused-loop/codegen rationale as
  * [[DotProduct]]; higher-order `aggregate(zip_with(...))` evaluates lambda
  * closures per element outside whole-stage codegen, which is the hot loop
  * of an int8 index scan at corpus scale. NULL on NULL input or length
  * mismatch, like [[DotProduct]]. */
case class IntDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot_product expects integral arrays, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "int_dot_product"

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val gx = VectorExpressions.longGetter(leftElem)
      val gy = VectorExpressions.longGetter(rightElem)
      val n = x.numElements()
      var acc = 0L
      var i = 0
      while (i < n) { acc += gx(x, i) * gy(y, i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gx = VectorExpressions.genLongGetter(leftElem)
    val gy = VectorExpressions.genLongGetter(rightElem)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${gx(x, i)} * ${gy(y, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

/** sqrt(sum(x_i^2)) with the same sequential fold as
  * `sqrt(aggregate(a, 0D, (acc,v) -> acc + v*v))`. */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_norm expects a numeric array, got $other")
    }
  override def prettyName: String = "vec_norm"

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val g = VectorExpressions.getter(elemType)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = g(x, i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = VectorExpressions.genGetter(elemType)
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${get(x, i)};
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

object VectorExpressions {

  /** per-element accessor covering EVERY numeric array type the type check
    * admits (the `get(i, null)` shortcut NPEs on int arrays, and Decimal is
    * not a java.lang.Number) */
  private[expr] def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType      => (a, i) => a.getFloat(i).toDouble
    case DoubleType     => (a, i) => a.getDouble(i)
    case IntegerType    => (a, i) => a.getInt(i).toDouble
    case LongType       => (a, i) => a.getLong(i).toDouble
    case ShortType      => (a, i) => a.getShort(i).toDouble
    case ByteType       => (a, i) => a.getByte(i).toDouble
    case d: DecimalType => (a, i) => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unsupported vector element type $other")
  }

  private[expr] def genGetter(dt: DataType): (String, String) => String = dt match {
    case FloatType      => (arr, i) => s"(double) $arr.getFloat($i)"
    case DoubleType     => (arr, i) => s"$arr.getDouble($i)"
    case IntegerType    => (arr, i) => s"(double) $arr.getInt($i)"
    case LongType       => (arr, i) => s"(double) $arr.getLong($i)"
    case ShortType      => (arr, i) => s"(double) $arr.getShort($i)"
    case ByteType       => (arr, i) => s"(double) $arr.getByte($i)"
    case d: DecimalType => (arr, i) => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalStateException(s"unsupported vector element type $other")
  }

  /** integral accessors for [[IntDotProduct]] — no doubles anywhere */
  private[expr] def longGetter(dt: DataType): (ArrayData, Int) => Long = dt match {
    case IntegerType => (a, i) => a.getInt(i).toLong
    case LongType    => (a, i) => a.getLong(i)
    case ShortType   => (a, i) => a.getShort(i).toLong
    case ByteType    => (a, i) => a.getByte(i).toLong
    case other => throw new IllegalStateException(s"unsupported integral element type $other")
  }

  private[expr] def genLongGetter(dt: DataType): (String, String) => String = dt match {
    case IntegerType => (arr, i) => s"(long) $arr.getInt($i)"
    case LongType    => (arr, i) => s"$arr.getLong($i)"
    case ShortType   => (arr, i) => s"(long) $arr.getShort($i)"
    case ByteType    => (arr, i) => s"(long) $arr.getByte($i)"
    case other => throw new IllegalStateException(s"unsupported integral element type $other")
  }

  /** Column API: dot product of two numeric-array columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API: exact integer dot product of two integral-array columns. */
  def intDotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API: euclidean norm of a numeric-array column. */
  def vecNorm(a: Column): Column =
    GraftColumnBridge.column(VecNorm(GraftColumnBridge.expression(a)))

  /** cosine = dot / (|a| * |b|) */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (vecNorm(a) * vecNorm(b))
}
