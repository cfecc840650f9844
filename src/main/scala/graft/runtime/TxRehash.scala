package graft.runtime

import org.apache.spark.sql.functions._

import graft.expr.{HashConfig, Hashing}

/** The reference's single-entity rehash lifecycle
  * (`macros/rehashing/single_entities/databricks/rehash_single_hub.sql`) on
  * the TRANSACTIONAL format — step for step:
  *
  *   1. `ALTER TABLE ADD COLUMN <hk>_updated` (`:17-26`)   → metadata-only
  *   2. `MERGE INTO` computing the new hashes (`:84-111`)  → one file-level
  *      rewrite, atomic, ghost rows keep their zero/error keys
  *   3. keep the old values as `<hk>_deprecated` (`:51-69`) → metadata-only
  *      rename (the recoverability column the reference preserves for
  *      exactly the partial-failure case)
  *   4. the new column takes the hash column's name         → metadata-only
  *
  * Exactly ONE pass reads and rewrites data (step 2); every schema step is
  * an O(1) manifest commit, and each step is individually atomic — a crash
  * between steps leaves a consistent, recoverable table (the old hashes are
  * still present, either under their original name or `_deprecated`).
  */
object TxRehash {

  /** A leftover `_deprecated` OR `_updated` column means a previous rehash
    * is mid-flight (crashed between its commits) — either is recoverable
    * state that a blind retry would corrupt, so both fail with the
    * rehash-specific message rather than a generic 'column exists' deep
    * inside [[TxLogTable.addColumn]]. */
  private def requireClean(t: TxLogTable, table: String,
                           updated: String, deprecated: String): Unit = {
    val cols = t.read(table).columns
    Seq(deprecated, updated).foreach(c =>
      require(!cols.contains(c),
        s"TxRehash: $table.$c already exists — " +
          "finish or roll back the previous rehash first"))
  }

  /** Rehash a keyed entity's hash column from its key columns (hub business
    * keys, or a link's stored FK hashkeys pre-translated by the caller). */
  def rehashEntity(t: TxLogTable, table: String, hashCol: String,
                   keyColumns: Seq[String],
                   oldCfg: HashConfig, newCfg: HashConfig): Unit = {
    val updated = s"${hashCol}_updated"
    val deprecated = s"${hashCol}_deprecated"
    requireClean(t, table, updated, deprecated)
    // 1. typed NULL column, no data touched
    t.addColumn(table, updated, newCfg.typeDdl)
    // 2. the one data pass: every live file rewritten in one atomic commit
    val v = t.currentVersion(table).get
    t.replaceFiles(table, t.files(table, v)) { df =>
      val ghost = col(hashCol) === oldCfg.zeroKeyLit || col(hashCol) === oldCfg.errorKeyLit
      val ghostValue = when(col(hashCol) === oldCfg.zeroKeyLit, newCfg.zeroKeyLit)
        .otherwise(newCfg.errorKeyLit)
      // hashInputs = the same H7 datatype normalization staging applies —
      // a rehash must reproduce what the NEXT stage load will compute
      df.withColumn(updated,
        when(ghost, ghostValue)
          .otherwise(Hashing.hashkey(Hashing.hashInputs(df, keyColumns))(newCfg)))
    }
    // 3./4. old values survive as _deprecated; new column takes the name
    t.renameColumn(table, hashCol, deprecated)
    t.renameColumn(table, updated, hashCol)
  }

  /** Drop the `_deprecated` recovery column once the rehash is validated —
    * the reference's final cleanup step, metadata-only here. */
  def dropDeprecated(t: TxLogTable, table: String, hashCol: String): Unit =
    t.dropColumn(table, s"${hashCol}_deprecated")

  // ---- whole-vault rehash on the transactional format --------------------
  // Reference `macros/rehashing/rehash_all_rdv_entities.sql:139-151`: hubs,
  // then links, then satellites, each through the single-entity MERGE + DDL
  // lifecycle on a LIVE table. Unlike the plain-store `Rehasher.rehashAll`
  // (which needs side checkpoint map tables because overwrite destroys the
  // old hashes), the transactional lifecycle keeps every entity's old→new
  // translation IN the entity itself as `<hk>_deprecated` — a crash between
  // any two commits leaves a consistent, fully recoverable vault, and the
  // children's re-key joins read the committed parent directly.

  import Rehasher.{HubRehash, LinkRehash, SatRehash}

  /** Rehash a whole raw vault on `t`. Per entity: one metadata-only ADD
    * COLUMN, ONE atomic data rewrite, two metadata-only RENAMEs — the exact
    * step sequence of [[rehashEntity]], so every intermediate state is
    * committed and recoverable. Old hashes survive as `<hk>_deprecated` on
    * every entity until [[dropDeprecatedAll]]. */
  def rehashAll(t: TxLogTable, hubs: Seq[HubRehash], links: Seq[LinkRehash],
                sats: Seq[SatRehash], oldCfg: HashConfig, newCfg: HashConfig): Unit = {

    // 1. hubs — after this each hub carries its own durable old→new map
    //    as (<hk>_deprecated, <hk>)
    hubs.foreach(h => rehashEntity(t, h.name, h.hashkey, h.businessKeys, oldCfg, newCfg))

    // 2. links: each FK re-keyed through its hub's (deprecated → current)
    //    columns; the link hashkey recomputed from ALL parent business keys
    //    (+ additional cols) in hub_config order (rehash_single_link
    //    semantics). A missing parent-map row fails the rewrite loudly —
    //    committing a mixed-hash vault silently is the one unrecoverable
    //    outcome (Rehasher.requireMapped).
    links.foreach(l => rehashLink(t, l, hubs, oldCfg, newCfg))

    // 3. satellites: re-keyed through the parent's (deprecated → current)
    //    pair; hashdiff recomputed from the sat's own payload under the new
    //    algorithm (grouped per (old hashkey, ldts) for MA sats — the
    //    rewrite covers ALL live files in one commit, so groups are
    //    complete by construction).
    sats.foreach(s => rehashSat(t, s, hubs, links, oldCfg, newCfg))
  }

  private def rehashLink(t: TxLogTable, l: LinkRehash, hubs: Seq[HubRehash],
                         oldCfg: HashConfig, newCfg: HashConfig): Unit = {
      val updated = s"${l.linkHashkey}_updated"
      val deprecated = s"${l.linkHashkey}_deprecated"
      requireClean(t, l.name, updated, deprecated)
      t.addColumn(l.name, updated, newCfg.typeDdl)
      val v = t.currentVersion(l.name).get
      // the FK columns now carry the hubs' NEW-config keys — their manifest
      // type must follow (a binary digest written through a stale 'string'
      // ColMap would be UTF-8-mangled by writeBatch's cast); replaceFiles
      // commits the retype atomically with this all-live-files rewrite
      t.replaceFiles(l.name, t.files(l.name, v),
        retype = l.hubRefs.map(_.fkCol -> newCfg.typeDdl).toMap) { df0 =>
        var df = df0
        var bkCols = Vector.empty[String]
        l.hubRefs.zipWithIndex.foreach { case (ref, i) =>
          val hub = hubs.find(_.name == ref.hubName).getOrElse(
            throw new IllegalArgumentException(
              s"link ${l.name}: hub ${ref.hubName} not in the hub list"))
          val renamedBks = ref.businessKeys.zipWithIndex.map { case (bk, j) => (bk, s"__bk_${i}_$j") }
          val mm = renamedBks.foldLeft(
            t.read(ref.hubName).select((col(s"${hub.hashkey}_deprecated").as(s"__old_$i") +:
              col(hub.hashkey).as(s"__new_$i") +: ref.businessKeys.map(col)): _*))(
            (d, p) => d.withColumnRenamed(p._1, p._2))
          df = df.join(mm, df(ref.fkCol) === mm(s"__old_$i"), "left")
          bkCols ++= renamedBks.map(_._2)
        }
        df = df.withColumn(updated,
          Rehasher.ghostGuard(l.linkHashkey, oldCfg, newCfg)(
            Hashing.hashkey(Hashing.hashInputs(df, bkCols ++ l.additionalCols))(newCfg)))
        l.hubRefs.zipWithIndex.foreach { case (ref, i) =>
          df = df.withColumn(ref.fkCol,
            Rehasher.ghostGuard(ref.fkCol, oldCfg, newCfg)(
              Rehasher.requireMapped(col(s"__new_$i"), col(ref.fkCol), l.name, ref.hubName)))
        }
        df.select(df0.columns.map(col).toIndexedSeq: _*)
      }
      t.renameColumn(l.name, l.linkHashkey, deprecated)
      t.renameColumn(l.name, updated, l.linkHashkey)
  }

  private def rehashSat(t: TxLogTable, s: SatRehash, hubs: Seq[HubRehash],
                        links: Seq[LinkRehash],
                        oldCfg: HashConfig, newCfg: HashConfig): Unit = {
      val parentHk = hubs.find(_.name == s.parent).map(_.hashkey)
        .orElse(links.find(_.name == s.parent).map(_.linkHashkey))
        .getOrElse(throw new IllegalArgumentException(
          s"satellite ${s.name}: parent ${s.parent} not in the hub/link lists"))
      val updated = s"${s.hashkey}_updated"
      val deprecated = s"${s.hashkey}_deprecated"
      requireClean(t, s.name, updated, deprecated)
      t.addColumn(s.name, updated, newCfg.typeDdl)
      val v = t.currentVersion(s.name).get
      // hashdiffs are recomputed under newCfg — retype with the rewrite
      // (see the link FK comment above)
      t.replaceFiles(s.name, t.files(s.name, v),
        retype = s.hashdiff.map(_ -> newCfg.typeDdl).toMap) { df0 =>
        val pmap = t.read(s.parent)
          .select(col(s"${parentHk}_deprecated").as("__old_hk"),
            col(parentHk).as("__new_hk")).distinct()
        var df = df0.join(pmap, df0(s.hashkey) === pmap("__old_hk"), "left")
        s.hashdiff.foreach { hd =>
          // hashInputs = the same H7 normalization the stage applies
          val payloadIn = Hashing.hashInputs(df0, s.payload)
          if (s.maKeys.nonEmpty) {
            val grouped = df0.groupBy(col(s.hashkey).as("__g_hk"), col("ldts").as("__g_ldts"))
              .agg(Hashing.maHashdiff(payloadIn, s.maKeys.map(col))(newCfg).as("__new_hd"))
            df = df.join(grouped,
              df(s.hashkey) === col("__g_hk") && df("ldts") === col("__g_ldts"), "left")
              .withColumn(hd, Rehasher.ghostGuard(hd, oldCfg, newCfg)(col("__new_hd")))
          } else {
            df = df.withColumn(hd,
              Rehasher.ghostGuard(hd, oldCfg, newCfg)(Hashing.hashdiff(payloadIn)(newCfg)))
          }
        }
        df.withColumn(updated,
            Rehasher.ghostGuard(s.hashkey, oldCfg, newCfg)(
              Rehasher.requireMapped(col("__new_hk"), col(s.hashkey), s.name, s.parent)))
          .select(df0.columns.map(col).toIndexedSeq: _*)
      }
      t.renameColumn(s.name, s.hashkey, deprecated)
      t.renameColumn(s.name, updated, s.hashkey)
  }

  /** Final cleanup once the whole-vault rehash is validated: drop every
    * entity's `_deprecated` recovery column — all metadata-only commits. */
  def dropDeprecatedAll(t: TxLogTable, hubs: Seq[HubRehash], links: Seq[LinkRehash],
                        sats: Seq[SatRehash]): Unit = {
    hubs.foreach(h => dropDeprecated(t, h.name, h.hashkey))
    links.foreach(l => dropDeprecated(t, l.name, l.linkHashkey))
    sats.foreach(s => dropDeprecated(t, s.name, s.hashkey))
  }

  // ---- crash recovery ----------------------------------------------------

  /** What [[recoverEntity]] found and did. */
  sealed abstract class Recovery(val label: String)
  object Recovery {
    /** no rehash in flight — table is in its pre-rehash state */
    case object Clean extends Recovery("clean")
    /** rehash already complete (`_deprecated` present, hash column live) */
    case object Done extends Recovery("done")
    /** dropped an unpopulated `_updated` — the data pass never committed */
    case object RolledBack extends Recovery("rolled_back")
    /** completed the remaining metadata-only renames */
    case object Finished extends Recovery("finished")
  }

  /** Recover a table from a rehash that crashed between commits. Sound
    * because the lifecycle has exactly ONE data commit ([[TxLogTable
    * .replaceFiles]] swaps all live files atomically): `_updated` is either
    * fully NULL (the pass never committed — dropping the column restores
    * the pre-rehash state exactly, including link FKs and sat hashdiffs,
    * which are only touched in that same commit) or fully populated (the
    * pass committed — the rest of the lifecycle is metadata-only renames,
    * so finishing forward is safe regardless of which rename crashed).
    * Every intermediate state maps to one of the four [[Recovery]] cases;
    * anything else means outside interference and fails loudly. */
  def recoverEntity(t: TxLogTable, table: String, hashCol: String): Recovery = {
    val updated = s"${hashCol}_updated"
    val deprecated = s"${hashCol}_deprecated"
    val cols = t.read(table).columns.toSet
    (cols(hashCol), cols(updated), cols(deprecated)) match {
      case (true, false, false) => Recovery.Clean
      case (true, false, true)  => Recovery.Done
      case (false, true, true) => // crashed between the two renames
        t.renameColumn(table, updated, hashCol)
        Recovery.Finished
      case (true, true, false) => // crashed around the data pass
        if (t.read(table).filter(col(updated).isNotNull).isEmpty) {
          t.dropColumn(table, updated)
          Recovery.RolledBack
        } else {
          t.renameColumn(table, hashCol, deprecated)
          t.renameColumn(table, updated, hashCol)
          Recovery.Finished
        }
      case (hc, up, dep) => throw new IllegalStateException(
        s"TxRehash: $table is not in any rehash lifecycle state " +
          s"($hashCol=$hc, $updated=$up, $deprecated=$dep) — manual repair needed")
    }
  }

  /** Resume a crashed [[rehashAll]] of the SAME (oldCfg, newCfg) run: per
    * entity in hub → link → sat order, finish or roll back whatever the
    * crash left ([[recoverEntity]]), skip entities already rehashed, and
    * rehash the rest. After it returns the vault is exactly where a
    * non-crashing rehashAll would have left it (old hashes on every entity
    * as `_deprecated` until [[dropDeprecatedAll]]). Returns each entity's
    * recovery finding. MUST be called with the original run's configs: a
    * `Done` entity is trusted to carry `newCfg` hashes — resuming with a
    * DIFFERENT target config would silently mix hash configurations, so
    * clean up the previous rehash fully before starting a new one. */
  def resumeAll(t: TxLogTable, hubs: Seq[HubRehash], links: Seq[LinkRehash],
                sats: Seq[SatRehash], oldCfg: HashConfig,
                newCfg: HashConfig): Map[String, Recovery] = {
    var findings = Map.empty[String, Recovery]
    def step(table: String, hashCol: String)(rehash: => Unit): Unit = {
      val r = recoverEntity(t, table, hashCol)
      findings += table -> r
      r match {
        case Recovery.Clean | Recovery.RolledBack => rehash
        case Recovery.Done | Recovery.Finished    => () // already on newCfg
      }
    }
    hubs.foreach(h => step(h.name, h.hashkey)(
      rehashEntity(t, h.name, h.hashkey, h.businessKeys, oldCfg, newCfg)))
    links.foreach(l => step(l.name, l.linkHashkey)(
      rehashLink(t, l, hubs, oldCfg, newCfg)))
    sats.foreach(s => step(s.name, s.hashkey)(
      rehashSat(t, s, hubs, links, oldCfg, newCfg)))
    findings
  }
}

/** S8 — PIT cleanup on the TRANSACTIONAL format: the reference's
  * `DELETE FROM pit WHERE sdts NOT IN (SELECT sdts FROM snap WHERE
  * is_active)` (`macros/hooks/clean_up_pits.sql:128-136`) compiled onto
  * [[TxLogTable.replaceFiles]].
  *
  * Cost shape: the REWRITE is O(files holding doomed rows); the PROBE that
  * finds them is column-pruned (sdts + file name only) and, when per-file
  * sdts stats exist ([[TxLogTable.setStatsColumns]]), file-pruned too —
  * a file whose recorded min == max is decided entirely from the manifest
  * (single sdts value: doomed iff that value is inactive) and never read.
  * On an sdts-clustered PIT ([[TxLogTable.compact]] with `clusterBy(sdts)`)
  * that is every file, so BOTH phases touch O(deactivated snapshots) files
  * — the transactional analogue of `PitCleaner.cleanUpPartitioned`. Without
  * stats the probe falls back to scanning (sdts, file) of all live files.
  *
  * NULL semantics match the reference DELETE: `sdts NOT IN (...)` is never
  * true for a NULL sdts, so NULL-sdts rows are always kept. */
object TxPitCleaner {

  /** Returns (files rewritten, live files before). */
  def cleanUp(t: TxLogTable, pitTable: String, snapshotTable: String,
              sdts: String = "sdts", trigger: String = "is_active"): (Int, Int) = {
    import org.apache.spark.sql.functions.{broadcast, input_file_name, lit}
    val active = t.read(snapshotTable).filter(col(trigger)).select(sdts).distinct()
    val v = t.currentVersion(pitTable).getOrElse(
      throw new IllegalStateException(s"TxLogTable $pitTable does not exist"))
    val live = t.files(pitTable, v)
    // the active set is snapshot metadata — O(log t) rows under logarithmic
    // retention — so it is collected (for stat pruning) and broadcast (for
    // the probe/rewrite). Values compare the way stats are rendered: CAST
    // AS STRING.
    val activeStr = active.select(col(sdts).cast("string")).collect()
      .flatMap(r => Option(r.getString(0))).toSet
    val physSdts = t.mapping(pitTable, v).find(_.logical == sdts)
      .map(_.physical).getOrElse(sdts)
    val stats = t.fileStats(pitTable, v)
    // min == max is the only SOUND stat skip for a set-membership DELETE: a
    // wider [min,max] can hide a doomed middle value even when both
    // endpoints are active. (All-NULL files carry no stats entry → probed,
    // then kept by the NULL rule.)
    val (decided, unsure) = live.partition(f =>
      stats.get((f, physSdts)).exists { case (mn, mx) => mn == mx })
    val doomedByStats = decided.filter(f => !activeStr(stats((f, physSdts))._1))
    // membership predicate against the ALREADY-COLLECTED active set: the
    // probe and the rewrite used to re-evaluate the snapshot scan (plus a
    // broadcast) each — two extra jobs per cleanup for a frame that is
    // already driver-side. An in-set literal keeps both single-scan. The
    // string-cast comparison is 1:1 with timestamp equality (one render
    // per value, the same form the stats use). Guarded: an unexpectedly
    // huge active set falls back to the broadcast join rather than a
    // million-literal predicate.
    val inSet = activeStr.size <= 10000
    def isActive(c: org.apache.spark.sql.Column) =
      c.cast("string").isin(activeStr.toSeq: _*)
    val doomedByProbe =
      if (unsure.isEmpty) Seq.empty[String]
      else {
        val probed = t.readFiles(pitTable, v, unsure)
          .withColumn("__file", input_file_name())
          .filter(col(sdts).isNotNull) // NOT IN never deletes NULL sdts
        val abs = (if (inSet) probed.filter(!isActive(col(sdts)))
                   else probed.join(broadcast(active), Seq(sdts), "left_anti"))
          .select("__file").distinct().collect().map(_.getString(0))
        unsure.filter(f => abs.exists(_.endsWith("/" + f)))
      }
    val touched = doomedByStats ++ doomedByProbe
    if (touched.nonEmpty)
      t.replaceFiles(pitTable, touched) { df =>
        // keep = active snapshots ∪ NULL-sdts rows (SQL NOT IN semantics)
        if (inSet) df.filter(col(sdts).isNull || isActive(col(sdts)))
        else {
          val keep = broadcast(active.withColumn("__active", lit(true)))
          df.join(keep, Seq(sdts), "left")
            .filter(col(sdts).isNull || col("__active"))
            .drop("__active")
        }
      }
    (touched.size, live.size)
  }
}
