package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams(text, n)` — a native Catalyst GENERATOR producing one row per
  * word n-gram: (pos, ngram). Completes graft's extension-point coverage
  * (scalar expressions, a TypedImperativeAggregate, and now a generator —
  * the three custom-function kinds Catalyst supports), registered through
  * GraftExtensions so it works from SQL text:
  *
  * {{{ SELECT g.pos, g.ngram FROM docs LATERAL VIEW ngrams(text, 3) g AS pos, ngram }}}
  *
  * The expression form beats the `transform(sequence(...))` + explode
  * composition the n-gram queries otherwise use: one pass over the split
  * words, no intermediate array-of-arrays, and the generate loop runs
  * inside GenerateExec without per-element lambda dispatch. (Generator
  * eval is CodegenFallback by design — GenerateExec drives the iterator;
  * only scalar children inline into codegen.)
  *
  * Null/edge semantics: NULL text or fewer than n words generate ZERO
  * rows (matching explode-of-empty), never a NULL row. `n` must be a
  * foldable positive integer.
  */
case class NGramsGenerator(child: Expression, n: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)
  override def prettyName: String = "ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType && n.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ngrams(text, n) expects (string, foldable int), got " +
        s"(${child.dataType}, ${n.dataType})")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  @transient private lazy val gramSize: Int =
    n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null || gramSize <= 0) return Iterator.empty
    val words = t.asInstanceOf[UTF8String].toString.trim
      .split("\\s+").filter(_.nonEmpty)
    if (words.length < gramSize) return Iterator.empty
    (0 to words.length - gramSize).iterator.map { i =>
      InternalRow(i, UTF8String.fromString(
        words.slice(i, i + gramSize).mkString(" ")))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGenerator =
    copy(child = newChildren(0), n = newChildren(1))

  // unused: Generator output flows through GenericArrayData only on the
  // interpreted terminate() path, which this generator does not use
  override def terminate(): IterableOnce[InternalRow] = Iterator.empty
  private def unusedArr = new GenericArrayData(Array.empty[Any])
}
