package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.GraftColumnBridge

import graft.expr.{DotProduct, HashConfig, Hashing, IntDotProduct, JaroWinklerSim, MaListAgg, NGramsGenerator, VecNorm}

/** SparkSessionExtensions registration for graft's native expressions, so
  * they are callable from SQL text as well as the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT dot_product(a, b), vec_norm(a), ma_list_agg(s) ...")
  * }}}
  *
  * (Or via `--conf spark.sql.extensions=graft.GraftExtensions` on a
  * cluster.) This is the brief's preferred route for custom operators:
  * native Expression + extension registration, no UDFs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product(a, b) takes two arrays")
        DotProduct(children(0), children(1))
      }),
    (new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "vec_norm(a) takes one array")
        VecNorm(children.head)
      }),
    (new FunctionIdentifier("int_dot_product"),
      new ExpressionInfo(classOf[IntDotProduct].getName, "int_dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "int_dot_product(a, b) takes two integral arrays")
        IntDotProduct(children(0), children(1))
      }),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "jaro_winkler(a, b) takes two strings")
        JaroWinklerSim(children(0), children(1))
      }),
    (new FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGramsGenerator].getName, "ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "ngrams(text, n) takes a string and an int")
        NGramsGenerator(children(0), children(1))
      }),
    (new FunctionIdentifier("ma_list_agg"),
      new ExpressionInfo(classOf[MaListAgg].getName, "ma_list_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "ma_list_agg(struct) takes one struct")
        MaListAgg(children.head)
      }),
    // the reference's hash semantics as plain SQL functions under the
    // DEFAULT HashConfig (MD5, dv4dbt delimiters/null markers) — the
    // registerViews plain-SQL surface can compute stage-identical keys:
    //   SELECT dv_hashkey(c_custkey), dv_hashdiff(c_name, c_acctbal) ...
    // Inputs are hashed as given (the H7 datatype normalization —
    // bool→1/0, nested→to_json — is the stage's pre-cast, applied by
    // Hashing.hashInputs at load time); non-default configs stay on the
    // Column API, which carries HashConfig implicitly.
    (new FunctionIdentifier("dv_hashkey"),
      new ExpressionInfo(Hashing.getClass.getName, "dv_hashkey"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty, "dv_hashkey(col, ...) takes at least one column")
        GraftColumnBridge.resolvedExpression(
          Hashing.hashkey(children.map(GraftColumnBridge.column))(HashConfig()))
      }),
    (new FunctionIdentifier("dv_hashdiff"),
      new ExpressionInfo(Hashing.getClass.getName, "dv_hashdiff"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty, "dv_hashdiff(col, ...) takes at least one column")
        GraftColumnBridge.resolvedExpression(
          Hashing.hashdiff(children.map(GraftColumnBridge.column))(HashConfig()))
      }))

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
