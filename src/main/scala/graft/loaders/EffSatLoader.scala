package graft.loaders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.SystemColumns._
import graft.ops.Ops

/** Effectivity satellite v0: tracks activation/deactivation of a driving
  * key. Reference `macros/tables/databricks/eff_sat_v0.sql`.
  *
  * Multi-batch mode builds the (hashkey × load-date) history matrix (J7) and
  * derives per-batch activity (J8); single-batch mode only activates new /
  * reactivated keys. In both modes, keys that disappeared from the source get
  * a deactivation row stamped with rsrc='SYSTEM'.
  *
  * Scale note: `load_dates` is tiny (#batches) — Spark broadcasts it, so the
  * "cross join" is a broadcast-nested-loop bounded by #keys × #batches, the
  * same cardinality the reference produces.
  */
object EffSatLoader {

  def records(
      source: DataFrame,
      hashkey: String,
      target: Option[DataFrame],
      isActiveAlias: String = "is_active",
      singleBatch: Boolean = false,
      disableHwm: Boolean = false,
      additionalColumns: Seq[String] = Nil): DataFrame = {

    val outCols = Seq(hashkey) ++ additionalColumns ++ Seq(LdtsAlias, RsrcAlias, isActiveAlias)
    val incremental = target.isDefined

    // source_data: ghost rows excluded + HWM (eff_sat_v0.sql:33-53);
    // additional_columns ride along (eff_sat_v0.sql:37,62)
    val src0 = Ops.excludeGhosts(
      source.select((Seq(hashkey) ++ additionalColumns ++ Seq(LdtsAlias, RsrcAlias)).map(col): _*))
    val src = if (disableHwm) src0 else Ops.hwmFilter(src0, target)

    // current_status: latest row per key in the existing sat (:58-73)
    val currentStatus = target.map(t =>
      Ops.dedupLatest(t, Seq(hashkey)).select(col(hashkey), col(isActiveAlias), col(RsrcAlias)))

    val incoming: DataFrame =
      if (!singleBatch) {
        // hashkeys + load_dates + history matrix (:77-115)
        val hashkeys = src.groupBy(col(hashkey)).agg(min(col(LdtsAlias)).as("__first"))
        val loadDates = src.select(LdtsAlias).distinct()
        val history = hashkeys.join(broadcast(loadDates),
          col(LdtsAlias) >= col("__first")).drop("__first")
        // is_active (:122-140); additional columns come from the matched
        // source row and stay NULL for inactive slots (:126-128)
        val isActive = history.join(
            src.select((Seq(col(hashkey).as("__src_hk"), col(LdtsAlias).as("__src_ldts"),
              col(RsrcAlias).as("__src_rsrc")) ++
              additionalColumns.map(c => col(c).as(s"__src_$c"))): _*),
            col(hashkey) === col("__src_hk") && col(LdtsAlias) === col("__src_ldts"),
            "left")
          .select((Seq(col(hashkey)) ++
            additionalColumns.map(c => col(s"__src_$c").as(c)) ++ Seq(col(LdtsAlias),
            coalesce(col("__src_rsrc"), lit(UnknownRsrc)).as(RsrcAlias),
            when(col("__src_hk").isNull, 0).otherwise(1).as(isActiveAlias))): _*)
        // deduplicated_incoming (:146-163): status changes only. The
        // incremental plan consumes this frame TWICE (the `filtered` branch
        // and the disappeared `present` probe) — persist so the history
        // matrix + change-dedup window run once per load, spilling to disk
        // if large. (The min-ldts probe itself reads src, not this frame.)
        val changes = Ops.dedupChanges(isActive, hashkey, isActiveAlias)
        if (incremental)
          changes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else changes
      } else {
        // new_hashkeys (:174-199): activate keys not currently active
        val newKeys = src.select((Seq(col(hashkey)) ++ additionalColumns.map(col) ++
          Seq(col(LdtsAlias), col(RsrcAlias), lit(1).as(isActiveAlias))): _*).distinct()
        currentStatus match {
          case None => newKeys
          case Some(cs) =>
            val active = cs.filter(col(isActiveAlias).cast("int") === 1).select(hashkey)
            newKeys.join(active, Seq(hashkey), "left_anti")
        }
      }

    val withDisappeared: DataFrame = currentStatus match {
      case None => incoming
      case Some(cs) =>
        // disappeared_hashkeys (:208-264): active keys absent from this delta
        // min-ldts probe runs on SRC, not the history matrix: the key with
        // the globally earliest ldts always keeps its first matrix slot
        // through the change-dedup (a first row per key is never dropped),
        // so min(incoming.ldts) == min(src.ldts) — and the probe job then
        // scans only the delta instead of computing the matrix + window
        val minRow = src.agg(min(col(LdtsAlias))).head()
        val activeNow = cs.filter(col(isActiveAlias).cast("int") === 1).select(hashkey)
        val disappeared =
          if (minRow.isNullAt(0)) incoming.limit(0)
          else {
            val present =
              if (!singleBatch) incoming.filter(col(LdtsAlias) === lit(minRow.getTimestamp(0))).select(hashkey)
              else src.select(hashkey)
            // disappeared rows carry NULL additional columns (:215-217)
            activeNow.join(present, Seq(hashkey), "left_anti")
              .select((Seq(col(hashkey)) ++
                additionalColumns.map(c => lit(null).cast(src.schema(c).dataType).as(c)) ++
                Seq(lit(minRow.getTimestamp(0)).as(LdtsAlias),
                  lit(UnknownRsrc).as(RsrcAlias), lit(0).as(isActiveAlias))): _*)
              .distinct()
          }

        // records_to_insert (:270-316): multi-batch compares the earliest
        // incoming status per key against current_status; then UNION (distinct)
        val filtered =
          if (!singleBatch) {
            val hit = cs.select(col(hashkey), col(isActiveAlias).cast("int").as("__cs_active"))
            // exclusion requires a current_status HIT: for a brand-new key
            // __cs_active is NULL and the negated predicate would be NULL too,
            // silently dropping its activation row — the reference's NOT
            // EXISTS (eff_sat_v0.sql:270-316) keeps rows with no match.
            incoming.join(hit, Seq(hashkey), "left")
              .filter(col("__cs_active").isNull ||
                !(col("__cs_active") === col(isActiveAlias).cast("int") &&
                  col(LdtsAlias) === lit(minRow.get(0))))
              .drop("__cs_active")
          } else incoming
        filtered.select(outCols.map(col): _*)
          .union(disappeared.select(outCols.map(col): _*))
          .distinct()
    }

    // final NOT EXISTS vs target on (hk, ldts) (:330-337)
    val result = target match {
      case Some(t) => Ops.antiJoin(withDisappeared, t, Seq(hashkey, LdtsAlias))
      case None    => withDisappeared
    }
    result.select((Seq(col(hashkey)) ++ additionalColumns.map(col) ++
      Seq(col(LdtsAlias), col(RsrcAlias),
        col(isActiveAlias).cast("boolean").as(isActiveAlias))): _*)
  }
}
