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
      customRsrc: Option[String] = None,
      pitType: Option[String] = None,
      snapshotOptimization: Boolean = false)(
      implicit hc: HashConfig = Hashing.Default): DataFrame = {

    // active snapshots only; FOJ ON trigger=true ⇒ cross join (pit.sql:76-84)
    val snapActive0 = snapshotTriggerColumn match {
      case Some(c) => snapshots.filter(col(c)).select(col(sdtsAlias))
      case None    => snapshots.select(col(sdtsAlias))
    }

    // snapshot_optimization (reference snowflake/pit.sql:29-70): on an
    // incremental run, only snapshots that can still gain rows get rebuilt
    // — O(changed snapshots × entities) instead of O(all snapshots ×
    // entities). Relevant = brand-new in the PIT, OR at a satellite's
    // global max ldts (new versions can still land there), OR holding
    // fewer slots than there are tracked entities (a new entity appeared,
    // or a cleaned/reactivated snapshot — a case the reference's two
    // conditions MISS, leaving its slots permanently absent). Unlike the
    // reference we also KEEP the dimension-key anti-join below (restricted
    // to the relevant snapshots), so a re-emitted slot never duplicates.
    // The relevant set is collected once — snapshot METADATA, same class
    // as a partition listing — so the target is aggregated exactly once.
    val snapActive = (target, snapshotOptimization) match {
      case (Some(t), true) =>
        val nEntities = trackedEntity.select(col(hashkey)).distinct().count()
        val maxCols = satellites.map(s =>
          max(col(s"${LdtsAlias}_${s.name}")).as(s"__max_${s.name}")) :+
          count(col("__t_one")).as("__cnt")
        val perSnap = snapActive0.join(
            t.select((col(sdtsAlias) +: lit(1).as("__t_one") +:
              satellites.map(s => col(s"${LdtsAlias}_${s.name}"))): _*),
            Seq(sdtsAlias), "left")
          .groupBy(col(sdtsAlias)).agg(maxCols.head, maxCols.tail: _*)
        val gCols = satellites.map(s =>
          max(col(s"__max_${s.name}")).as(s"__g_${s.name}"))
        val global = perSnap.agg(gCols.head, gCols.tail: _*)
        val relevant = satellites.map(s =>
          col(s"__max_${s.name}").isNull ||
            col(s"__max_${s.name}") === col(s"__g_${s.name}")).reduce(_ || _) ||
          col("__cnt") < lit(nEntities)
        val relevantSdts = perSnap.crossJoin(broadcast(global)).filter(relevant)
          .select(col(sdtsAlias)).collect().map(_.get(0))
        snapActive0.filter(col(sdtsAlias).isInCollection(relevantSdts.toSeq))
      case _ => snapActive0
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
          coalesce(col(s"__${sat.name}_hk"), hc.zeroKeyLit).as(s"hk_${sat.name}"),
          coalesce(col(s"__${sat.name}_ldts"), beginningOfAllTimesTs).as(s"${LdtsAlias}_${sat.name}"))
      else
        Seq(col(s"__${sat.name}_hk").as(s"hk_${sat.name}"),
          col(s"__${sat.name}_ldts").as(s"${LdtsAlias}_${sat.name}"))
    }

    // dimension key = hash([pit_type,] hashkey, sdts) (pit.sql:23-28,38-48);
    // a BINARY hashkey enters the dimension-key hash input hex-cast, like
    // the reference's TO_HEX(te.hashkey) (databricks/pit.sql:10-14)
    val hkInput = if (hc.isBinary) lower(hex(col(hashkey))) else col(hashkey)
    val dimKey = Hashing.hashkey(
      pitType.map(t => lit(t): org.apache.spark.sql.Column).toSeq ++
        Seq(hkInput, col(sdtsAlias)))
    val typeCols = pitType.map(t => lit(t).as("type")).toSeq
    val rsrcCols = customRsrc.map(r => lit(r).as(RsrcAlias)).toSeq

    val out = df.select(
      (typeCols ++ rsrcCols ++
        Seq(dimKey.as(dimensionKey), col(hashkey), col(sdtsAlias)) ++ satCols): _*)
      .distinct()

    target match {
      case Some(t) =>
        // with snapshot_optimization the anti-join target scan only needs
        // the relevant snapshots' slots — semi-restrict before the compare
        val tRestricted =
          if (snapshotOptimization) t.join(snapActive, Seq(sdtsAlias), "left_semi")
          else t
        Ops.antiJoin(out, tRestricted, Seq(dimensionKey)) // pit.sql:108-114
      case None => out
    }
  }

  /** AS-OF strategy — same result as [[records]] for contiguously end-dated
    * satellites (every SatV1Loader/MaSatV1Loader output: ledts chains have
    * no gaps, so "version valid at sdts" ≡ "last version with ldts ≤ sdts").
    *
    * Instead of the hashkey-equi + BETWEEN range join — whose per-key cost
    * is (#versions × #snapshots) comparisons — this unions version-start
    * events with snapshot probes and takes a single running `last(...)
    * ignoreNulls` window per hashkey: O((#versions + #snapshots) log) per
    * key, one shuffle by hashkey for ALL satellites. The scale path when
    * satellites are deep (many versions per key) and snapshot sets large.
    */
  def recordsAsOf(
      trackedEntity: DataFrame,
      hashkey: String,
      satellites: Seq[PitSatellite],
      snapshots: DataFrame,
      dimensionKey: String,
      target: Option[DataFrame] = None,
      sdtsAlias: String = SdtsAlias,
      snapshotTriggerColumn: Option[String] = Some("is_active"),
      customRsrc: Option[String] = None)(
      implicit hc: HashConfig = Hashing.Default): DataFrame = {

    import org.apache.spark.sql.expressions.Window

    val snapActive = snapshotTriggerColumn match {
      case Some(c) => snapshots.filter(col(c)).select(col(sdtsAlias))
      case None    => snapshots.select(col(sdtsAlias))
    }
    // probes: every (entity, snapshot) slot, one row per PIT output row
    val probes = trackedEntity.select(col(hashkey)).crossJoin(broadcast(snapActive))

    var df = probes
    satellites.foreach { sat =>
      val a = s"__${sat.name}"
      // version-start events; probe events carry NULL version columns
      val versions = sat.df.select(col(hashkey),
        col(LdtsAlias).as("__ts"), lit(0).as("__probe"),
        col(hashkey).as(s"${a}_vhk"), col(LdtsAlias).as(s"${a}_vldts"))
      val probeEvents = probes.select(col(hashkey),
        col(sdtsAlias).as("__ts"), lit(1).as("__probe"),
        lit(null).cast("string").as(s"${a}_vhk"),
        lit(null).cast("timestamp").as(s"${a}_vldts"))
      // running as-of state: versions sort before probes at equal ts, so a
      // version starting exactly at sdts is already visible to the probe
      val w = Window.partitionBy(col(hashkey)).orderBy(col("__ts").asc, col("__probe").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val asOf = versions.unionByName(probeEvents)
        .withColumn(s"${a}_hk", last(col(s"${a}_vhk"), ignoreNulls = true).over(w))
        .withColumn(s"${a}_ldts", last(col(s"${a}_vldts"), ignoreNulls = true).over(w))
        .filter(col("__probe") === 1)
        .select(col(hashkey), col("__ts").as(sdtsAlias),
          col(s"${a}_hk"), col(s"${a}_ldts"))
      df = df.join(asOf, Seq(hashkey, sdtsAlias), "left")
    }

    val satCols: Seq[Column] = satellites.flatMap { sat =>
      val a = s"__${sat.name}"
      Seq(coalesce(col(s"${a}_hk"), hc.zeroKeyLit).as(s"hk_${sat.name}"),
        coalesce(col(s"${a}_ldts"), beginningOfAllTimesTs).as(s"${LdtsAlias}_${sat.name}"))
    }
    val hkInput = if (hc.isBinary) lower(hex(col(hashkey))) else col(hashkey)
    val dimKey = Hashing.hashkey(Seq(hkInput, col(sdtsAlias)))
    val rsrcCols = customRsrc.map(r => lit(r).as(RsrcAlias)).toSeq
    val out = df.select(
      (rsrcCols ++ Seq(dimKey.as(dimensionKey), col(hashkey), col(sdtsAlias)) ++ satCols): _*)
      .distinct()
    target match {
      case Some(t) => Ops.antiJoin(out, t, Seq(dimensionKey))
      case None    => out
    }
  }
}
