package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.VectorExpressions._

/** The native codegen'd vector expressions must be BIT-IDENTICAL to the
  * higher-order-function fold they replace (same sequential double
  * accumulation) — the DuckDB oracles depend on it. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (Array(1.0f, 2.5f, -3.25f), Array(0.5f, -1.0f, 2.0f)),
    (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f)),
    (Array(1e-7f, 1e7f, -1e-7f), Array(1e7f, 1e-7f, 1e7f)),
    (Array(0f, 0f, 0f), Array(1f, 1f, 1f)))

  test("dot_product matches the aggregate(zip_with(...)) fold bit-for-bit") {
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      dotProduct($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_norm matches sqrt(aggregate(...)) bit-for-bit") {
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      vecNorm($"a").as("native"),
      expr("sqrt(aggregate(a, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double arrays and NULL propagation") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("f", "d")
    assert(df.select(dotProduct($"f", $"d")).head().getDouble(0) == 1.0)
    val withNull = df.select(dotProduct(lit(null).cast("array<float>"), $"d"))
    assert(withNull.head().isNullAt(0))
  }

  test("length mismatch yields NULL (zip_with null-padding semantics), not a partial sum") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(dotProduct($"a", $"b")).head().isNullAt(0))
  }

  test("non-nullable, non-foldable children still codegen (nullable override)") {
    // array(x, y) of non-null columns is non-nullable and NOT constant-
    // foldable: without nullable=true the generated code was `false = true;`
    val df = Seq((1.0f, 2.0f, 3.0f)).toDF("x", "y", "z")
    val r = df.select(
      dotProduct(array($"x", $"y"), array($"y", $"z")).as("dp"),
      dotProduct(array($"x", $"y"), array($"z")).as("mismatch")).head()
    assert(r.getDouble(0) == 8.0)
    assert(r.isNullAt(1))
  }

  test("integer and long arrays work through the SQL registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1, 2, 3), array(4, 5, 6)) AS dp,
        |       vec_norm(array(3L, 4L)) AS nrm""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("int_dot_product: exact long arithmetic equal to the HOF fold") {
    val df = Seq(
      (Array(255L, 0L, 128L), Array(255L, 255L, 2L)),
      (Array(-5L, 7L, 11L), Array(3L, -2L, 1L)),
      (Array(1000000L, 1000000L), Array(1000000L, 1000000L)))
      .toDF("a", "b")
    val rows = df.select(
      intDotProduct($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("int_dot_product: NULL on null input and length mismatch, rejects float arrays") {
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 1L))).toDF("a", "b")
    assert(df.select(intDotProduct($"a", $"b")).head().isNullAt(0))
    assert(df.select(intDotProduct(lit(null).cast("array<long>"), $"a"))
      .head().isNullAt(0))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1.0f), Array(1L))).toDF("f", "l")
        .select(intDotProduct($"f", $"l")).collect()
    }
    assert(err.getMessage.contains("int_dot_product") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
