package graft.loaders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.SystemColumns._
import graft.ops.Ops

/** Reference table: flattened current/historized view over a ref hub and its
  * ref satellites. Reference `macros/tables/databricks/ref_table.sql`.
  *
  * @param historized "full" (one row per ref key × known ldts), "latest"
  *                   (only the newest load date), or "snapshot" (spine =
  *                   the ACTIVE snapshots of `snapshots`), matching the
  *                   reference's options (`ref_table.sql:48-85`).
  */
object RefTableLoader {

  final case class RefSat(df: DataFrame, include: Seq[String])

  def build(
      refHub: DataFrame,
      refKeys: Seq[String],
      satellites: Seq[RefSat],
      historized: String = "full",
      includeBeforeAppearance: Boolean = false,
      snapshots: Option[DataFrame] = None,
      snapshotTrigger: String = "is_active",
      sdtsAlias: String = SdtsAlias): DataFrame = {

    // date spine: union of satellite load dates (U5, ref_table.sql:56-68),
    // or the active snapshots when historized='snapshot' (:71-85)
    val dates = historized match {
      case "snapshot" =>
        val snap = snapshots.getOrElse(throw new IllegalArgumentException(
          "historized='snapshot' requires a snapshot relation"))
        snap.filter(col(snapshotTrigger)).select(col(sdtsAlias).as(LdtsAlias)).distinct()
      case other =>
        val allDates = satellites.map(s =>
            s.df.filter(col(LdtsAlias) =!= endOfAllTimesTs).select(col(LdtsAlias)).distinct())
          .reduce(_.union(_)).distinct()
        if (other == "latest") allDates.agg(max(col(LdtsAlias)).as(LdtsAlias))
        else allDates
    }

    val hub = refHub.select((refKeys.map(col) :+ col(RsrcAlias) :+ col(LdtsAlias).as("__hub_ldts")): _*)
    var df = hub.crossJoin(broadcast(dates.select(col(LdtsAlias).as("__spine_ldts"))))

    satellites.zipWithIndex.foreach { case (sat, i) =>
      val a = s"__s$i"
      val renamedKeys = refKeys.map(k => col(k).as(s"${a}_$k"))
      val satSel = sat.df.select((renamedKeys ++
        Seq(col(LdtsAlias).as(s"${a}_ldts"), col(LedtsAlias).as(s"${a}_ledts")) ++
        sat.include.map(c => col(c))): _*)
      val keyCond = refKeys.map(k => col(k) === col(s"${a}_$k")).reduce(_ && _)
      df = df.join(satSel,
        keyCond && col("__spine_ldts").between(col(s"${a}_ldts"), col(s"${a}_ledts")),
        "left")
    }

    if (!includeBeforeAppearance) df = df.filter(col("__hub_ldts") <= col("__spine_ldts"))

    // snapshot mode names its date column sdts (reference date_column)
    val dateAlias = if (historized == "snapshot") sdtsAlias else LdtsAlias
    val out = refKeys.map(col) ++ Seq(col("__spine_ldts").as(dateAlias), col(RsrcAlias)) ++
      satellites.flatMap(_.include).map(col)
    df.select(out: _*)
  }
}
