package graft.loaders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.{HashConfig, Hashing}
import graft.expr.SystemColumns._
import graft.ops.Ops

/** One satellite participating in a PIT (reference pit.sql `sat_names`).
  * If the satellite has no ledts column (v0), it is end-dated inline
  * (reference `pit.sql:90-96`). */
final case class PitSatellite(name: String, df: DataFrame, hasLedts: Boolean = true)

/** Point-In-Time table: for every (tracked entity, active snapshot), the
  * satellite version valid at that snapshot. Reference
  * `macros/tables/databricks/pit.sql`.
  *
  * Plan shape at scale: hub × active-snapshots is a broadcast cross join
  * (snapshots are tiny); each satellite joins with an equi-key on hashkey
  * plus a BETWEEN range predicate — a sort-merge join keyed on hashkey,
  * which co-partitions with the hub side.
  */
object PitLoader {

  def records(
      trackedEntity: DataFrame,
      hashkey: String,
      satellites: Seq[PitSatellite],
      snapshots: DataFrame,
      dimensionKey: String,
      target: Option[DataFrame] = None,
      sdtsAlias: String = SdtsAlias,
      snapshotTriggerColumn: Option[String] = Some("is_active"),
      referToGhostRecords: Boolean = true,
      customRsrc: Option[String] = None)(
      implicit hc: HashConfig = Hashing.Default): DataFrame = {

    // active snapshots only; FOJ ON trigger=true ⇒ cross join (pit.sql:76-84)
    val snapActive = snapshotTriggerColumn match {
      case Some(c) => snapshots.filter(col(c)).select(col(sdtsAlias))
      case None    => snapshots.select(col(sdtsAlias))
    }
    val te = trackedEntity.select(col(hashkey))
    var df = te.crossJoin(broadcast(snapActive))

    val satCols: Seq[Column] = satellites.flatMap { sat =>
      // v0 sats without ledts get end-dated inline (pit.sql:90-96)
      val satDf =
        if (sat.hasLedts)
          sat.df.select(col(hashkey).as(s"__${sat.name}_hk"),
            col(LdtsAlias).as(s"__${sat.name}_ldts"),
            col(LedtsAlias).as(s"__${sat.name}_ledts"))
        else Ops.endDate(
          sat.df.select(col(hashkey).as(s"__${sat.name}_hk"),
            col(LdtsAlias).as(s"__${sat.name}_ldts")),
          s"__${sat.name}_hk", s"__${sat.name}_ldts", s"__${sat.name}_ledts")
      df = df.join(satDf,
        col(s"__${sat.name}_hk") === col(hashkey) &&
          col(sdtsAlias).between(col(s"__${sat.name}_ldts"), col(s"__${sat.name}_ledts")),
        "left")
      if (referToGhostRecords)
        Seq(
          coalesce(col(s"__${sat.name}_hk"), lit(hc.zeroKey)).as(s"hk_${sat.name}"),
          coalesce(col(s"__${sat.name}_ldts"), beginningOfAllTimesTs).as(s"${LdtsAlias}_${sat.name}"))
      else
        Seq(col(s"__${sat.name}_hk").as(s"hk_${sat.name}"),
          col(s"__${sat.name}_ldts").as(s"${LdtsAlias}_${sat.name}"))
    }

    // dimension key = hash(hashkey, sdts) (pit.sql:38-48,60-63)
    val dimKey = Hashing.hashkey(Seq(col(hashkey), col(sdtsAlias)))
    val rsrcCols = customRsrc.map(r => lit(r).as(RsrcAlias)).toSeq

    val out = df.select(
      (rsrcCols ++ Seq(dimKey.as(dimensionKey), col(hashkey), col(sdtsAlias)) ++ satCols): _*)
      .distinct()

    target match {
      case Some(t) => Ops.antiJoin(out, t, Seq(dimensionKey)) // pit.sql:108-114
      case None    => out
    }
  }
}
