package graft.loaders

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * rolling windows (daily for a duration, weekly for a duration on the
  * start-of-week snapshot, monthly on start-of-month, yearly on
  * start-of-year) — bounding PIT size to O(log t).
  */

/** One interval's window (`control_snap_v1.sql:100-148`): `forever=true`
  * drops the time bound entirely; otherwise the snapshot must lie within
  * `now - INTERVAL duration unit`. Units: DAY / WEEK / MONTH / YEAR. */
final case class IntervalLogic(duration: Int = 0, unit: String = "DAY",
                               forever: Boolean = false) {
  private val u = unit.trim.toLowerCase
  require(IntervalLogic.Units.contains(u) || forever,
    s"interval unit '$unit' not one of ${IntervalLogic.Units.mkString("/")}")
  def bound(s: Column, now: Column): Column =
    if (forever) lit(true)
    else s.between(now - expr(s"interval $duration $u"), now)
}
object IntervalLogic {
  val Units: Set[String] = Set("day", "week", "month", "year")
  def forever: IntervalLogic = IntervalLogic(0, "DAY", forever = true)
}

/** One trigger column = OR over its configured intervals
  * (`control_snap_v1.sql:4-18`: a single mapping produces the default
  * `is_active` column; a LIST of {column: config} mappings produces one
  * trigger column each). */
final case class SnapshotTrigger(
    column: String = "is_active",
    daily: Option[IntervalLogic] = None,
    weekly: Option[IntervalLogic] = None,
    monthly: Option[IntervalLogic] = None,
    yearly: Option[IntervalLogic] = None)

/** Back-compat shorthand for the common fixed-unit windows; `None` on an
  * interval means that interval applies forever. */
final case class LogLogic(
    dailyDays: Option[Int] = Some(90),
    weeklyWeeks: Option[Int] = Some(52),
    monthlyMonths: Option[Int] = Some(60),
    yearlyYears: Option[Int] = None) {
  def toTrigger(column: String): SnapshotTrigger = SnapshotTrigger(
    column,
    daily = Some(dailyDays.map(IntervalLogic(_, "DAY")).getOrElse(IntervalLogic.forever)),
    weekly = Some(weeklyWeeks.map(w => IntervalLogic(w * 7, "DAY")).getOrElse(IntervalLogic.forever)),
    monthly = Some(monthlyMonths.map(IntervalLogic(_, "MONTH")).getOrElse(IntervalLogic.forever)),
    yearly = Some(yearlyYears.map(IntervalLogic(_, "YEAR")).getOrElse(IntervalLogic.forever)))
}

object ControlSnapV1Loader {

  def build(snapV0: DataFrame, logLogic: Option[LogLogic] = None,
            sdtsAlias: String = SdtsAlias,
            snapshotTriggerAlias: String = "is_active",
            referenceTs: Option[String] = None): DataFrame =
    buildMulti(snapV0, logLogic.map(ll => Seq(ll.toTrigger(snapshotTriggerAlias))).getOrElse(Nil),
      sdtsAlias, snapshotTriggerAlias, referenceTs)

  /** Full reference semantics (`control_snap_v1.sql:80-232`): one OR-of-
    * intervals CASE per trigger config; with no config the single trigger
    * column reduces to `force_active`. Output schema mirrors the
    * reference's `active_logic_combined` — is_latest + rolling-year flags
    * included, `force_active` not emitted. NOTE (reference-faithful): when
    * log-logic configs ARE given, the trigger CASE ignores `force_active`
    * entirely (`control_snap_v1.sql:100-148,196-202` — it participates
    * only in the no-config branch), so a force-deactivated v0 row inside a
    * configured window still triggers; deactivate via the v0 model or the
    * PIT cleanup, not force_active, when log logic is on. */
  def buildMulti(snapV0: DataFrame, triggers: Seq[SnapshotTrigger],
                 sdtsAlias: String = SdtsAlias,
                 snapshotTriggerAlias: String = "is_active",
                 referenceTs: Option[String] = None): DataFrame = {
    val s = col(sdtsAlias)
    val now = referenceTs.map(t => to_timestamp(lit(t))).getOrElse(current_timestamp())

    val triggerCols: Seq[Column] =
      if (triggers.isEmpty) Seq(col("force_active").as(snapshotTriggerAlias))
      else triggers.map { t =>
        val parts =
          t.daily.map(_.bound(s, now)).toSeq ++
            t.weekly.map(il => col("is_beginning_of_week") && il.bound(s, now)) ++
            t.monthly.map(il => col("is_beginning_of_month") && il.bound(s, now)) ++
            t.yearly.map(il => col("is_beginning_of_year") && il.bound(s, now))
        val active = if (parts.isEmpty) lit(false) else parts.reduce(_ || _)
        coalesce(active, lit(false)).as(t.column)
      }

    // latest_row (:71-78): whole-frame max over the control table — tiny by
    // construction (one row/day), so the single-partition window is free and
    // keeps the build lazy (no driver-side action)
    val latest = max(s).over(org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing))

    snapV0.select(
      (Seq(s, col("replacement_sdts")) ++ triggerCols ++ Seq(
        (s === latest).as("is_latest"),
        col("caption"),
        col("is_hourly"), col("is_daily"),
        col("is_beginning_of_week"), col("is_end_of_week"),
        col("is_beginning_of_month"), col("is_end_of_month"),
        col("is_beginning_of_quarter"), col("is_end_of_quarter"),
        col("is_beginning_of_year"), col("is_end_of_year"),
        (year(s) === year(now)).as("is_current_year"),
        (year(s) === year(now) - 1).as("is_last_year"),
        s.between(now - expr("interval 1 year"), now).as("is_rolling_year"),
        s.between(now - expr("interval 2 year"), now - expr("interval 1 year"))
          .as("is_last_rolling_year"),
        col("comment"))): _*)
  }
}
