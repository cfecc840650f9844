package graft.meta

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.Metrics.MetricDef

/** Metrics-layer contract: dim guard, filter gating, ratio composition,
  * and the empty-grain (corpus-total) path. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    ("a", "x", 10.0), ("a", "y", 20.0), ("b", "x", 30.0), ("b", "x", 40.0)
  ).toDF("g", "s", "v")

  test("compute: filtered sum at a grain") {
    val m = MetricDef("v_sum", Metrics.Sum, "v",
      filter = Some("s = 'x'"), dims = Seq("g"))
    val got = Metrics.compute(t, m, Seq("g"))
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map("a" -> Some(10.0), "b" -> Some(70.0)))
  }

  test("compute: undeclared dim is rejected") {
    val m = MetricDef("v_sum", Metrics.Sum, "v", dims = Seq("g"))
    assertThrows[IllegalArgumentException](Metrics.compute(t, m, Seq("s")))
  }

  test("ratio: corpus grain (empty by) composes via cross join") {
    val num = MetricDef("v_sum", Metrics.Sum, "v")
    val den = MetricDef("n", Metrics.Count, "v")
    val got = Metrics.ratio(t, "mean_v", num, den, by = Nil).collect().head
    assert(got.getAs[Double]("mean_v") == 25.0)
  }

  test("ratio: grain values present in only one side still report") {
    val num = MetricDef("x_sum", Metrics.Sum, "v",
      filter = Some("s = 'y'"), dims = Seq("g"))
    val den = MetricDef("n", Metrics.Count, "v", dims = Seq("g"))
    val got = Metrics.ratio(t, "r", num, den, by = Seq("g"))
      .select("g", "r").as[(String, Option[Double])].collect().toMap
    assert(got("a").contains(10.0) && got("b").isEmpty) // 20 / 2 rows
  }
}
