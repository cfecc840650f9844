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

  /** @param sources (staged df, hk column, model name, rsrc_static
    *   patterns — empty keeps the real rsrc column; SEVERAL patterns emit
    *   one row-set per pattern, each stamped with its pattern and
    *   watermarked against it, like the reference's per-pattern UNION ALL
    *   `rec_track_sat.sql:142-162`) */
  def records(
      sources: Seq[(DataFrame, String, String, Seq[String])],
      trackedHashkey: String,
      target: Option[DataFrame],
      stgAlias: String = "stg",
      disableHwm: Boolean = false): DataFrame = {

    val perSource = sources.flatMap { case (df, hkCol, modelName, rsrcStatics) =>
      def stamped(rsrc: org.apache.spark.sql.Column) = df.select(
        col(hkCol).as(trackedHashkey),
        col(LdtsAlias),
        rsrc.cast("string").as(RsrcAlias),
        lit(modelName.toUpperCase).cast("string").as(stgAlias)
      ).distinct()
      (target, rsrcStatics) match {
        case _ if disableHwm =>
          if (rsrcStatics.isEmpty) Seq(stamped(col(RsrcAlias)))
          else rsrcStatics.map(rs => stamped(lit(rs)))
        case (Some(t), rss) if rss.nonEmpty =>
          val included = !t.filter(rss.map(col(RsrcAlias).like).reduce(_ || _)).isEmpty
          rss.map { rs =>
            val base = stamped(lit(rs))
            if (included) Ops.hwmPerRsrcStatic(base, t, Seq(rs)) else base
          }
        // global HWM for every source (not only single-source loads) — see
        // KeyedEntityLoader: ldts is the batch load timestamp
        case (Some(t), _) => Seq(Ops.hwmFilter(stamped(col(RsrcAlias)), Some(t)))
        case _ =>
          if (rsrcStatics.isEmpty) Seq(stamped(col(RsrcAlias)))
          else rsrcStatics.map(rs => stamped(lit(rs)))
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
