package graft.loaders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.SystemColumns._
import graft.ops.Ops

/** Standard (v0) satellite: change-only historization of a descriptive
  * payload per parent hashkey. Reference `macros/tables/databricks/sat_v0.sql`.
  */
object SatV0Loader {

  /** Emits `records_to_insert`.
    * @param keys        parent identity — hashkey for sats (`Seq("hk_x")`),
    *                    ref-key combination for ref sats (ref_sat_v0.sql
    *                    shares this exact shape with multi-column keys)
    * @param dedupCol    hashdiff alias; None → no change-dedup (Modus C)
    */
  def records(
      source: DataFrame,
      keys: Seq[String],
      dedupCol: Option[String],
      payload: Seq[String],
      target: Option[DataFrame],
      singleBatch: Boolean = false,
      disableHwm: Boolean = false,
      additionalColumns: Seq[String] = Nil): DataFrame = {

    val outCols = (keys ++ dedupCol.toSeq ++ Seq(RsrcAlias, LdtsAlias) ++ payload ++
      additionalColumns).distinct

    // source_data + HWM (sat_v0.sql:46-62)
    val src0 = source.select(outCols.map(col): _*)
    val src = if (disableHwm) src0 else Ops.hwmFilter(src0, target)

    val incremental = target.isDefined
    val doDedup = dedupCol.isDefined && !singleBatch

    // deduplicated_numbered_source (sat_v0.sql:93-114): LAG change-dedup + rn
    val deduped = if (doDedup) {
      // partition the LAG by ALL keys (ref_sat_v0.sql does the same for
      // composite ref keys) — keys.head alone interleaves distinct entities
      val d = Ops.dedupChanges(src, keys, dedupCol.get)
      if (incremental) {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(LdtsAlias).asc)
        d.withColumn("__rn", row_number().over(w))
      } else d
    } else src

    // records_to_insert NOT EXISTS (sat_v0.sql:131-142): drop a row only if
    // it is the oldest incoming row for its key (rn=1) AND the target's
    // latest (key, dedup) entry carries the same value.
    target match {
      case None => deduped.select(outCols.map(col): _*)
      case Some(t) =>
        val latestKeys = keys ++ dedupCol.toSeq
        // performance_filter.sql (filter_latest_entries_in_sat): the target's
        // latest-entry scan only needs keys PRESENT IN THIS DELTA — a
        // left-semi restriction that turns an O(target) aggregate into
        // O(delta keys) before the NOT-EXISTS compare
        val srcKeys = deduped.select(keys.map(col): _*).distinct()
        val latest = Ops.dedupLatest(
            t.select((keys ++ dedupCol.toSeq :+ LdtsAlias).distinct.map(col): _*)
              .join(srcKeys, keys, "left_semi"), keys)
          .select(latestKeys.map(col): _*)
          .withColumn("__hit", lit(1))
        val joined = deduped.join(latest, latestKeys, "left")
        val keep =
          if (doDedup) col("__hit").isNull || col("__rn") =!= 1
          else col("__hit").isNull
        joined.filter(keep).select(outCols.map(col): _*)
    }
  }
}

/** v1 satellite: virtual end-dating view over a v0 satellite.
  * Reference `macros/tables/databricks/sat_v1.sql`; with a composite
  * `keys` set this is `ref_sat_v1.sql` (LEAD partitioned by ALL ref keys). */
object SatV1Loader {
  def build(satV0: DataFrame, keys: Seq[String], hashdiff: Option[String],
            addIsCurrentFlag: Boolean, includePayload: Boolean,
            ledtsAlias: String): DataFrame = {
    val payload = satV0.columns.filterNot(c =>
      keys.contains(c) || hashdiff.contains(c) || c == LdtsAlias || c == RsrcAlias)
    val ordered = keys ++ hashdiff.toSeq ++ Seq(RsrcAlias, LdtsAlias)
    var df = Ops.endDate(satV0, keys, LdtsAlias, ledtsAlias)
    if (addIsCurrentFlag) df = Ops.isCurrentFlag(df, ledtsAlias)
    val cols = ordered ++ Seq(ledtsAlias) ++
      (if (addIsCurrentFlag) Seq(IsCurrentAlias) else Nil) ++
      (if (includePayload) payload.toSeq else Nil)
    df.select(cols.map(col): _*)
  }

  def build(satV0: DataFrame, hashkey: String, hashdiff: Option[String],
            addIsCurrentFlag: Boolean = false, includePayload: Boolean = true,
            ledtsAlias: String = LedtsAlias): DataFrame =
    build(satV0, Seq(hashkey), hashdiff, addIsCurrentFlag, includePayload, ledtsAlias)

  def build(satV0: DataFrame, keys: Seq[String], hashdiff: Option[String],
            addIsCurrentFlag: Boolean): DataFrame =
    build(satV0, keys, hashdiff, addIsCurrentFlag, includePayload = true, LedtsAlias)
}

/** Multi-active satellite v0: the hashdiff describes the whole active set
  * per (hashkey, ldts). Reference `macros/tables/databricks/ma_sat_v0.sql`. */
object MaSatV0Loader {
  def records(
      source: DataFrame,
      hashkey: String,
      hashdiff: String,
      maKeys: Seq[String],
      payload: Seq[String],
      target: Option[DataFrame],
      singleBatch: Boolean = false,
      disableHwm: Boolean = false): DataFrame = {

    val outCols = (Seq(hashkey, hashdiff, RsrcAlias, LdtsAlias) ++ maKeys ++ payload).distinct
    val src0 = source.select(outCols.map(col): _*)
    val src = if (disableHwm) src0 else Ops.hwmFilter(src0, target)

    // deduped_row_hashdiff (ma_sat_v0.sql:71-84): one row per (hk, ldts),
    // keep only groups whose hashdiff changed vs the previous load; then
    // INNER JOIN restores all multi-active rows of the kept groups.
    val grouped =
      if (singleBatch) src
      else {
        val groups = src.select(hashkey, LdtsAlias, hashdiff).distinct()
        val kept = Ops.dedupChanges(groups, hashkey, hashdiff)
        src.join(kept, Seq(hashkey, LdtsAlias, hashdiff), "left_semi")
      }

    target match {
      case None => grouped.select(outCols.map(col): _*)
      case Some(t) =>
        // NOT EXISTS vs target's latest (hk, hashdiff) (ma_sat_v0.sql:110-117);
        // target scan semi-restricted to this delta's keys (performance_filter)
        val latest = Ops.dedupLatest(
            t.select(hashkey, hashdiff, LdtsAlias)
              .join(grouped.select(hashkey).distinct(), Seq(hashkey), "left_semi"),
            Seq(hashkey))
          .select(hashkey, hashdiff)
        grouped.join(latest, Seq(hashkey, hashdiff), "left_anti")
          .select(outCols.map(col): _*)
    }
  }
}

/** Multi-active satellite v1: end-date the distinct (hk, ldts) loads, join
  * back to all rows. Reference `macros/tables/databricks/ma_sat_v1.sql`. */
object MaSatV1Loader {
  def build(satV0: DataFrame, hashkey: String, hashdiff: String, maKeys: Seq[String],
            addIsCurrentFlag: Boolean = false, ledtsAlias: String = LedtsAlias): DataFrame = {
    val loads = satV0.select(hashkey, LdtsAlias).distinct()
    val endDated = Ops.endDate(loads, hashkey, ledtsAlias = ledtsAlias)
    val payload = satV0.columns.filterNot(c =>
      c == hashkey || c == hashdiff || maKeys.contains(c) || c == LdtsAlias || c == RsrcAlias)
    var df = satV0.join(endDated, Seq(hashkey, LdtsAlias), "left")
    if (addIsCurrentFlag) df = Ops.isCurrentFlag(df, ledtsAlias)
    val cols = Seq(hashkey, hashdiff, RsrcAlias, LdtsAlias, ledtsAlias) ++
      (if (addIsCurrentFlag) Seq(IsCurrentAlias) else Nil) ++ maKeys ++ payload
    df.select(cols.map(col): _*)
  }
}

/** Non-historized satellite: first version per hashkey only, insert-once.
  * Reference `macros/tables/databricks/nh_sat.sql`. */
object NhSatLoader {
  def records(source: DataFrame, hashkey: String, payload: Seq[String],
              target: Option[DataFrame], singleBatch: Boolean = false): DataFrame = {
    val outCols = (Seq(hashkey, LdtsAlias, RsrcAlias) ++ payload).distinct
    val src0 = source.select(outCols.map(col): _*)
    val src = Ops.hwmFilter(src0, target)
    val first = if (singleBatch) src else Ops.dedupEarliest(src, Seq(hashkey))
    target match {
      case None    => first
      case Some(t) => Ops.antiJoin(first, t, Seq(hashkey))
    }
  }
}
