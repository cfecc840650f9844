package graft.expr

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Golden vectors for the native Jaro–Winkler expression — the classic
  * Winkler (1990) test pairs plus edge cases — evaluated through the
  * static kernel, the Column API (codegen path), and the SQL function
  * registration, all three agreeing to 1e-9. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val golden = Seq(
    // Winkler's canonical pairs
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    // transpositions with a zero-length common prefix → no boost applies
    ("ABCVWXYZ", "CABVWXYZ", 0.9583333333333334),
    // every char outside the half-length match window → zero matches
    ("apple", "zebra", 0.0),
    // identity, disjoint, empty (both-empty = 0.0, the DuckDB/RapidFuzz
    // convention the oracle pins — not the textbook 1.0)
    ("same", "same", 1.0),
    ("abc", "xyz", 0.0),
    ("", "", 0.0),
    ("abc", "", 0.0))

  test("kernel matches the published Jaro-Winkler values") {
    golden.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(math.abs(got - want) < 1e-9, s"jw($a, $b) = $got, want $want")
      // symmetry
      val rev = JaroWinkler.compute(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(math.abs(got - rev) < 1e-12, s"jw must be symmetric on ($a, $b)")
    }
  }

  test("Column and SQL paths agree with the kernel (codegen exercised)") {
    graft.GraftExtensions.register(spark)
    val df = golden.map { case (a, b, w) => (a, b, w) }.toDF("a", "b", "want")
    val rows = df.select(
      JaroWinkler.sim($"a", $"b").as("col_path"),
      expr("jaro_winkler(a, b)").as("sql_path"),
      $"want").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-9, r.toString)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
    // NULL propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.sim($"a", $"b")).collect()
    assert(n.head.isNullAt(0), "NULL input must yield NULL")
  }
}
