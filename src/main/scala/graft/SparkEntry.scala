package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ConformanceQueries, DvQueries, ErQueries, GeoQueries, GraphQueries, JoinQueries, MartQueries, PrivacyQueries, RelQueries, ScaleQueries, SimQueries, StatsQueries, StreamingQueries, TextQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registry lives in graft.queries.* (one entry per implemented
  * operator from SURVEY §2 plus the training-data operator suite).
  */
object SparkEntry {
  private lazy val registry = {
    val r = DvQueries.all ++ TextQueries.all ++ SimQueries.all ++ RelQueries.all ++
      JoinQueries.all ++ StatsQueries.all ++ ScaleQueries.all ++
      ConformanceQueries.all ++ TpchQueries.all ++ MartQueries.all ++ ErQueries.all ++ GraphQueries.all ++ PrivacyQueries.all ++ StreamingQueries.all ++ GeoQueries.all
    // the maps below are keyed by name — a duplicate would SILENTLY shadow
    // one query's fn/oracle with another's and the driver compare would
    // green-light the survivor; fail loudly instead
    val dup = r.groupBy(_.name).collect { case (n, qs) if qs.sizeIs > 1 => n }
    require(dup.isEmpty, s"duplicate query names in registry: ${dup.mkString(", ")}")
    r
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full PIT build (stage → sat v0 → v1 → hub × snapshots → temporal join). */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "pit_customer").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
