package graft.loaders

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.SystemColumns._

/** Snapshot control table v0: generated daily timestamp series + calendar
  * flags. Reference `macros/tables/databricks/control_snap_v0.sql`.
  *
  * Spark-first: `sequence() + explode` generates distributedly; the series is
  * tiny (one row/day) so this stays a single-task stage that AQE keeps local.
  */
object ControlSnapV0Loader {

  def build(spark: SparkSession, startDate: String, dailySnapshotTime: String = "00:00:00",
            endDate: Option[String] = None, sdtsAlias: String = SdtsAlias,
            target: Option[DataFrame] = None, firstDayOfWeek: Int = 1): DataFrame = {

    val endExpr = endDate.map(d => s"to_date('$d')").getOrElse("current_date()")
    val series = spark.range(1).select(
      explode(expr(
        s"sequence(to_timestamp('$startDate $dailySnapshotTime'), " +
          s"to_timestamp($endExpr + 1) - interval 1 microsecond, interval 1 day)"
      )).as("sdts_raw"))
      .filter(col("sdts_raw") < expr(s"to_timestamp($endExpr + 1)"))

    // incremental: only timestamps newer than the existing max (:35-38)
    val fresh = target match {
      case Some(t) =>
        val maxRow = t.agg(max(col(sdtsAlias))).head()
        if (maxRow.isNullAt(0)) series
        else series.filter(col("sdts_raw") > lit(maxRow.getTimestamp(0)))
      case None => series
    }

    val s = col("sdts_raw")
    val isoDow = expr("extract(DAYOFWEEK_ISO FROM sdts_raw)")
    fresh.select(
      s.as(sdtsAlias),
      lit(true).as("force_active"),
      s.as("replacement_sdts"),
      concat(lit("Snapshot "), to_date(s).cast("string")).as("caption"),
      (minute(s) === 0 && second(s) === 0).as("is_hourly"),
      (minute(s) === 0 && second(s) === 0 && hour(s) === 0).as("is_daily"),
      (isoDow === firstDayOfWeek).as("is_beginning_of_week"),
      (isoDow === ((firstDayOfWeek + 5) % 7) + 1).as("is_end_of_week"),
      (dayofmonth(s) === 1).as("is_beginning_of_month"),
      (last_day(to_date(s)) === to_date(s)).as("is_end_of_month"),
      (dayofmonth(s) === 1 && month(s).isin(1, 4, 7, 10)).as("is_beginning_of_quarter"),
      (month(s).isin(3, 6, 9, 12) && dayofmonth(s) === dayofmonth(last_day(s))).as("is_end_of_quarter"),
      (dayofmonth(s) === 1 && month(s) === 1).as("is_beginning_of_year"),
      (last_day(to_date(s)) === to_date(s) && month(s) === 12).as("is_end_of_year"),
      lit(null).cast("string").as("comment"))
  }
}

/** Snapshot control v1: logarithmic retention logic layered over v0 as a
  * (virtual) view. Reference `macros/tables/databricks/control_snap_v1.sql`.
  *
  * The log logic: a snapshot stays active if it falls inside the configured
  * rolling windows (daily for N days, weekly for N weeks on the
  * start-of-week snapshot, monthly on start-of-month, yearly on
  * start-of-year) — bounding PIT size to O(log t).
  */
final case class LogLogic(
    dailyDays: Option[Int] = Some(90),
    weeklyWeeks: Option[Int] = Some(52),
    monthlyMonths: Option[Int] = Some(60),
    yearlyYears: Option[Int] = None) // None ⇒ forever

object ControlSnapV1Loader {

  def build(snapV0: DataFrame, logLogic: Option[LogLogic] = None,
            sdtsAlias: String = SdtsAlias,
            snapshotTriggerAlias: String = "is_active",
            referenceTs: Option[String] = None): DataFrame = {
    val s = col(sdtsAlias)
    val now = referenceTs.map(t => to_timestamp(lit(t))).getOrElse(current_timestamp())

    val active = logLogic match {
      case None => lit(true)
      case Some(ll) =>
        val daily = ll.dailyDays match {
          case Some(d)  => s.between(now - expr(s"interval $d days"), now)
          case None     => lit(true)
        }
        val weekly = ll.weeklyWeeks match {
          case Some(w)  => col("is_beginning_of_week") && s.between(now - expr(s"interval ${w * 7} days"), now)
          case None     => col("is_beginning_of_week")
        }
        val monthly = ll.monthlyMonths match {
          case Some(m)  => col("is_beginning_of_month") && s.between(add_months(now, -m), now)
          case None     => col("is_beginning_of_month")
        }
        val yearly = ll.yearlyYears match {
          case Some(y)  => col("is_beginning_of_year") && s.between(add_months(now, -12 * y), now)
          case None     => col("is_beginning_of_year")
        }
        daily || weekly || monthly || yearly
    }

    snapV0.select(
      s,
      col("replacement_sdts"),
      col("force_active"),
      (col("force_active") && active).as(snapshotTriggerAlias),
      col("caption"),
      col("is_hourly"), col("is_daily"),
      col("is_beginning_of_week"), col("is_end_of_week"),
      col("is_beginning_of_month"), col("is_end_of_month"),
      col("is_beginning_of_quarter"), col("is_end_of_quarter"),
      col("is_beginning_of_year"), col("is_end_of_year"),
      col("comment"))
  }
}
