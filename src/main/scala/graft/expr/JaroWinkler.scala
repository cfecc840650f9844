package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen'd expression —
  * Spark has no built-in (only levenshtein), yet it is THE standard
  * record-linkage name comparator (Winkler's variant of Jaro is what the
  * Fellegi–Sunter literature and every MDM product defaults to).
  *
  * Standard definition: Jaro = (m/|a| + m/|b| + (m−t)/m)/3 with the
  * half-max-length match window and transposition count; Winkler adds
  * ℓ·p·(1−jaro) for the common prefix ℓ ≤ 4 with p = 0.1, applied only
  * when jaro exceeds the 0.7 boost threshold — byte-compatible with
  * DuckDB's `jaro_winkler_similarity` (verified on the full customer
  * name corpus by the er_jaro_similarity oracle).
  *
  * The generated code calls the static [[JaroWinkler.compute]] kernel —
  * the same pattern as Spark's own levenshtein (a static UTF8String
  * helper inside whole-stage codegen, no per-row virtual dispatch). */
object JaroWinkler {

  /** static kernel; invoked from generated code. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    // empty-side convention follows DuckDB/RapidFuzz (both-empty = 0.0,
    // not the textbook 1.0) — the oracle pins byte-compatibility
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: compare matched chars in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t / 2).toDouble / m) / 3.0
    // Winkler prefix boost, standard 0.7 threshold and p = 0.1, ℓ ≤ 4
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      val maxPrefix = math.min(4, math.min(l1, l2))
      while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix))
        prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }

  def sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects two strings, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
