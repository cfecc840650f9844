package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Native codegen'd vector arithmetic for the similarity-search operators.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)`
  * — which allocates a zipped intermediate array and invokes lambda closures
  * per element — with a tight fused loop inside whole-stage codegen. The
  * fold order is IDENTICAL (sequential, left-to-right, double accumulator),
  * so results are bit-for-bit the same as the higher-order-function form and
  * the DuckDB oracle's list_sum(list_transform(list_zip(...))).
  *
  * NULL semantics: NULL if either input array is NULL (matching zip_with /
  * aggregate); array elements are assumed non-null (embeddings).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
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

  private def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType  => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case other      => (a, i) => a.get(i, other).asInstanceOf[Number].doubleValue()
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = getter(leftElem)
    val gy = getter(rightElem)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += gx(x, i) * gy(y, i); i += 1 }
    acc
  }

  private def genGetter(dt: DataType): (String, String) => String = dt match {
    case FloatType  => (arr, i) => s"(double) $arr.getFloat($i)"
    case DoubleType => (arr, i) => s"$arr.getDouble($i)"
    case _          => (arr, i) => s"((Number) $arr.get($i, null)).doubleValue()"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gx = genGetter(leftElem)
    val gy = genGetter(rightElem)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${gx(x, i)} * ${gy(y, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
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
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    elemType match {
      case FloatType =>
        while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
      case DoubleType =>
        while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
      case _ =>
        while (i < n) {
          val v = x.get(i, elemType).asInstanceOf[Number].doubleValue(); acc += v * v; i += 1
        }
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = elemType match {
      case FloatType  => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case DoubleType => (arr: String, i: String) => s"$arr.getDouble($i)"
      case _          => (arr: String, i: String) => s"((Number) $arr.get($i, null)).doubleValue()"
    }
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
  /** Column API: dot product of two numeric-array columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API: euclidean norm of a numeric-array column. */
  def vecNorm(a: Column): Column =
    GraftColumnBridge.column(VecNorm(GraftColumnBridge.expression(a)))

  /** cosine = dot / (|a| * |b|) */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (vecNorm(a) * vecNorm(b))
}
