package graft.loaders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.SystemColumns._
import graft.ops.Ops

/** Record-tracking satellite: one row per (hashkey, ldts, rsrc) appearance
  * of a key in any source. Reference
  * `macros/tables/databricks/rec_track_sat.sql:100-250`.
  */
object RecTrackSatLoader {

  /** @param sources (staged df, hk column, model name, optional rsrc_static) */
  def records(
      sources: Seq[(DataFrame, String, String, Option[String])],
      trackedHashkey: String,
      target: Option[DataFrame],
      stgAlias: String = "stg",
      disableHwm: Boolean = false): DataFrame = {

    val perSource = sources.map { case (df, hkCol, modelName, rsrcStatic) =>
      val base = df.select(
        col(hkCol).as(trackedHashkey),
        col(LdtsAlias),
        rsrcStatic.map(rs => lit(rs).cast("string")).getOrElse(col(RsrcAlias).cast("string")).as(RsrcAlias),
        lit(modelName.toUpperCase).cast("string").as(stgAlias)
      ).distinct()
      (target, rsrcStatic) match {
        case _ if disableHwm => base
        case (Some(t), Some(rs)) =>
          val included = !t.filter(col(RsrcAlias).like(rs)).isEmpty
          if (included) Ops.hwmPerRsrcStatic(base, t, Seq(rs)) else base
        // global HWM for every source (not only single-source loads) — see
        // KeyedEntityLoader: ldts is the batch load timestamp
        case (Some(t), None) => Ops.hwmFilter(base, Some(t))
        case _ => base
      }
    }

    val unioned = Ops.unionSources(perSource)
      .filter(col(LdtsAlias) =!= beginningOfAllTimesTs &&
        col(LdtsAlias) =!= endOfAllTimesTs)

    target match {
      // NOT IN on CONCAT(hk, ldts, rsrc) ⇒ multi-column anti-join (:228-237)
      case Some(t) => Ops.antiJoin(unioned, t, Seq(trackedHashkey, LdtsAlias, RsrcAlias))
      case None    => unioned
    }
  }
}
