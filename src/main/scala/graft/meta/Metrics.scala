package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative metrics layer (the dbt-metrics / semantic-layer shape that
  * sits on top of a vault's information marts): a metric is DATA — an
  * aggregation type, a measure expression, optional filter, and the
  * dimensions it may be grouped by — and compiles to one partial-
  * aggregating DataFrame plan per request. Ratio metrics compose two
  * base metrics at the same grain with one join.
  *
  * Reference surface: datavault4dbt ships dbt models consumed by exactly
  * this layer downstream; keeping definitions declarative means every
  * metric is ONE codegen'd aggregate at any scale, never a hand-rolled
  * query per dashboard.
  */
object Metrics {

  sealed trait Agg
  case object Sum extends Agg
  case object Count extends Agg
  case object CountDistinct extends Agg
  case object Avg extends Agg

  /** A metric definition. `measure` and `filter` are SQL expression
    * strings (the same extensibility contract as StageLoader's derived
    * columns); `dims` is the allowed group-by surface. */
  final case class MetricDef(name: String, agg: Agg, measure: String,
                             filter: Option[String] = None,
                             dims: Seq[String] = Nil)

  private def aggColumn(m: MetricDef): Column = {
    val e = expr(m.measure)
    val gated = m.filter match {
      case Some(f) => when(expr(f), e)
      case None    => e
    }
    m.agg match {
      case Sum           => sum(gated)
      case Count         => count(gated)
      case CountDistinct => countDistinct(gated)
      case Avg           => avg(gated)
    }
  }

  /** Compile one metric over `table` grouped by `by` (must be a subset of
    * the definition's declared dims — the guard that keeps dashboards
    * from grouping a non-additive metric by an unvetted column). */
  def compute(table: DataFrame, m: MetricDef, by: Seq[String]): DataFrame = {
    val bad = by.filterNot(m.dims.contains)
    require(bad.isEmpty,
      s"metric ${m.name}: dims ${bad.mkString(",")} not declared (allowed: ${m.dims.mkString(",")})")
    val grouped =
      if (by.isEmpty) table.groupBy()
      else table.groupBy(by.map(col): _*)
    grouped.agg(aggColumn(m).as(m.name))
  }

  /** A ratio metric at a shared grain: numerator/denominator computed as
    * two independent aggregates joined on the grain (full outer — a grain
    * value present in only one side still reports). */
  def ratio(table: DataFrame, name: String, num: MetricDef, den: MetricDef,
            by: Seq[String], scale: Int = 6): DataFrame = {
    val n = compute(table, num, by)
    val d = compute(table, den, by)
    val joined = if (by.isEmpty) n.crossJoin(d) else n.join(d, by, "full_outer")
    joined.withColumn(name,
      round(col(num.name).cast("double") / col(den.name), scale))
  }
}
