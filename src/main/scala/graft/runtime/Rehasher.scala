package graft.runtime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.{HashConfig, Hashing}

/** Maintenance operations (SURVEY §2.1 S7/S8/S9 + §3.3).
  *
  * The reference implements rehashing as an imperative ALTER TABLE /
  * MERGE / RENAME script per entity
  * (`macros/rehashing/single_entities/databricks/rehash_single_hub.sql`).
  * On a transactional format this is DeltaTable.merge + ALTER TABLE; on the
  * parquet store it is a read-modify-overwrite with the same row-level
  * semantics: every row's hash columns are recomputed from the business
  * keys, EXCEPT ghost records, which keep their zero/error keys
  * (`rehash_single_hub.sql:84-111` — the MERGE's WHEN MATCHED guards on the
  * ghost keys).
  */
object Rehasher {

  /** Recompute `hashCol` from `keyColumns` across an entire entity
    * (e.g. after switching hash algorithm MD5 → SHA256). */
  def rehashEntity(store: TableStore, table: String, hashCol: String,
                   keyColumns: Seq[String], oldCfg: HashConfig, newCfg: HashConfig): Unit =
    store.rewrite(table) { df =>
      val ghost = col(hashCol) === oldCfg.zeroKeyLit || col(hashCol) === oldCfg.errorKeyLit
      val ghostValue = when(col(hashCol) === oldCfg.zeroKeyLit, newCfg.zeroKeyLit)
        .otherwise(newCfg.errorKeyLit)
      // hashInputs = the same H7 datatype normalization staging applies —
      // a rehash must reproduce what the NEXT stage load will compute
      df.withColumn(hashCol,
        when(ghost, ghostValue)
          .otherwise(Hashing.hashkey(Hashing.hashInputs(df, keyColumns))(newCfg)))
    }

  /** Targeted rehash at O(affected partitions) on a `pcol`-partitioned
    * entity: recompute `hashCol` only for rows matching `affected` (e.g. a
    * corrected business-key subset, or a resume after a partial run), then
    * MERGE the delta back touching only the partitions that contain it
    * ([[TableStore.mergePartitioned]]). This is the parquet-store shape of
    * the reference's `MERGE INTO` rehash (`rehash_single_hub.sql:84-111`)
    * on a partitioned lake: a whole-vault rewrite at 100 TB cannot be
    * O(table) × N entities, and with `affected` pinned to partition values
    * the delta scan is partition-pruned too. */
  def rehashEntityPartitioned(store: TableStore, table: String, pcol: String,
                              hashCol: String, keyColumns: Seq[String],
                              oldCfg: HashConfig, newCfg: HashConfig,
                              affected: Column): Unit = {
    val df = store.read(table).filter(affected)
    val ghost = col(hashCol) === oldCfg.zeroKeyLit || col(hashCol) === oldCfg.errorKeyLit
    val ghostValue = when(col(hashCol) === oldCfg.zeroKeyLit, newCfg.zeroKeyLit)
      .otherwise(newCfg.errorKeyLit)
    val delta = df.withColumn(hashCol,
      when(ghost, ghostValue)
        .otherwise(Hashing.hashkey(Hashing.hashInputs(df, keyColumns))(newCfg)))
    store.mergePartitioned(table, pcol, delta, keyColumns)
  }

  /** S9 — rename a column (reference ALTER TABLE ... RENAME COLUMN,
    * `rehashing/internal_overwrites/get_rename_column_sql.sql`). */
  def renameColumn(store: TableStore, table: String, from: String, to: String): Unit =
    store.rewrite(table)(_.withColumnRenamed(from, to))

  /** S9 — add a typed column (reference alter_table_add_col.sql). */
  def addColumn(store: TableStore, table: String, name: String, dtype: String): Unit =
    store.rewrite(table)(_.withColumn(name, lit(null).cast(dtype)))

  /** S9 — drop columns. */
  def dropColumns(store: TableStore, table: String, names: String*): Unit =
    store.rewrite(table)(_.drop(names: _*))

  // ---- whole-vault rehash orchestration --------------------------------
  // Reference `macros/rehashing/rehash_all_rdv_entities.sql`: hubs first,
  // then links, then satellites. The reference keeps a `<hk>_deprecated`
  // column on rehashed parents so children can still join on the old value
  // (`rehash_single_satellite.sql` databricks `satellite_update_statement`);
  // we express the same dependency as explicit (old_hk → new_hk [, bks])
  // mapping frames captured BEFORE each parent is overwritten.

  final case class HubRehash(name: String, hashkey: String, businessKeys: Seq[String])
  final case class LinkHubRef(fkCol: String, hubName: String, businessKeys: Seq[String])
  final case class LinkRehash(name: String, linkHashkey: String, hubRefs: Seq[LinkHubRef],
                              additionalCols: Seq[String] = Nil)
  /** maKeys non-empty ⇒ MA satellite (grouped hashdiff); hashdiff None ⇒
    * NH satellite (hashkey only). */
  final case class SatRehash(name: String, hashkey: String, hashdiff: Option[String],
                             payload: Seq[String], parent: String, maKeys: Seq[String] = Nil)

  private[runtime] def ghostGuard(hashCol: String, oldCfg: HashConfig, newCfg: HashConfig)(
      recompute: Column): Column =
    when(col(hashCol) === oldCfg.zeroKeyLit, newCfg.zeroKeyLit)
      .when(col(hashCol) === oldCfg.errorKeyLit, newCfg.errorKeyLit)
      .otherwise(recompute)

  /** A child row whose parent-map join missed has NO valid new key: keeping
    * the old one would commit a mixed-hash vault with no error raised.
    * `raise_error` fails the rewrite job on the first orphan row — checked
    * inline during the write, no extra counting pass. (The reference keeps
    * `<hk>_deprecated` columns for the same recoverability concern.) */
  private[runtime] def requireMapped(mapped: Column, old: Column, entity: String,
                                     parent: String): Column =
    coalesce(mapped, raise_error(concat(
      lit(s"rehash $entity: no $parent map row for key '"), old, lit("'"))))

  /** Rehash the whole raw vault. Hub/link/sat specs mirror the reference's
    * rehash_all YAML; see [[rehashAllFromYaml]] for the YAML front end. */
  def rehashAll(store: TableStore, hubs: Seq[HubRehash], links: Seq[LinkRehash],
                sats: Seq[SatRehash], oldCfg: HashConfig, newCfg: HashConfig): Unit = {

    // 1. per-hub translate maps (old_hk, new_hk, business keys), written
    //    DURABLY to the store before the hub tables are rewritten: a mere
    //    cache() could lose partitions after the rewrite and silently
    //    recompute the map from the NEW hashes (executor loss / eviction is
    //    routine at scale) — a checkpoint table cannot
    val hubMaps: Map[String, DataFrame] = hubs.map { h =>
      val df = store.read(h.name)
      val m = df
        .withColumn("__new_hk",
          ghostGuard(h.hashkey, oldCfg, newCfg)(
            Hashing.hashkey(Hashing.hashInputs(df, h.businessKeys))(newCfg)))
        .select((col(h.hashkey).as("__old_hk") +: col("__new_hk") +:
          h.businessKeys.map(col)): _*)
      store.overwrite(s"__rehash_map_${h.name}", m)
      h.name -> store.read(s"__rehash_map_${h.name}")
    }.toMap

    // 2. hubs
    hubs.foreach(h => rehashEntity(store, h.name, h.hashkey, h.businessKeys, oldCfg, newCfg))

    // 3. links: each FK re-keyed via its hub map; the link hashkey is
    //    recomputed from ALL parent business keys (+ additional cols) in
    //    hub_config order (rehash_single_link semantics). Each link also
    //    yields its own (old → new) map so NH sats can hang off links.
    val linkMaps: Map[String, DataFrame] = links.map { l =>
      val df0 = store.read(l.name)
      var df = df0
      var bkCols = Vector.empty[String]
      l.hubRefs.zipWithIndex.foreach { case (ref, i) =>
        val renamedBks = ref.businessKeys.zipWithIndex.map { case (bk, j) => (bk, s"__bk_${i}_$j") }
        val mm = renamedBks.foldLeft(hubMaps(ref.hubName))((d, p) => d.withColumnRenamed(p._1, p._2))
          .withColumnRenamed("__old_hk", s"__old_$i").withColumnRenamed("__new_hk", s"__new_$i")
          .select((Seq(s"__old_$i", s"__new_$i") ++ renamedBks.map(_._2)).map(col): _*)
        df = df.join(mm, df(ref.fkCol) === mm(s"__old_$i"), "left")
        bkCols ++= renamedBks.map(_._2)
      }
      var next = df.withColumn("__new_lhk",
        ghostGuard(l.linkHashkey, oldCfg, newCfg)(
          Hashing.hashkey(Hashing.hashInputs(df, bkCols ++ l.additionalCols))(newCfg)))
      store.overwrite(s"__rehash_map_${l.name}",
        next.select(col(l.linkHashkey).as("__old_hk"), col("__new_lhk").as("__new_hk"))
          .distinct())
      val m = store.read(s"__rehash_map_${l.name}")
      next = next.withColumn(l.linkHashkey, col("__new_lhk"))
      l.hubRefs.zipWithIndex.foreach { case (ref, i) =>
        next = next.withColumn(ref.fkCol,
          ghostGuard(ref.fkCol, oldCfg, newCfg)(
            requireMapped(col(s"__new_$i"), col(ref.fkCol), l.name, ref.hubName)))
      }
      val result = next.select(df0.columns.map(col).toIndexedSeq: _*)
      store.rewrite(l.name)(_ => result)
      l.name -> m
    }.toMap

    // 4. satellites: parent map (hub OR link) re-keys the hashkey; hashdiff
    //    recomputed from the sat's own payload (grouped for MA sats)
    val parentMaps = hubMaps.map { case (k, v) => k -> v.select("__old_hk", "__new_hk") } ++ linkMaps
    sats.foreach { s =>
      val parentMap = parentMaps.getOrElse(s.parent,
        throw new IllegalArgumentException(
          s"satellite ${s.name}: parent ${s.parent} not in the hub/link lists"))
      store.rewrite(s.name) { df0 =>
        var df = df0.join(parentMap, df0(s.hashkey) === parentMap("__old_hk"), "left")
        s.hashdiff.foreach { hd =>
          // hashInputs = the same H7 normalization the stage applies
          val payloadIn = Hashing.hashInputs(df0, s.payload)
          if (s.maKeys.nonEmpty) {
            // MA: grouped hashdiff per (old hashkey, ldts), joined back
            val grouped = df0.groupBy(col(s.hashkey).as("__g_hk"), col("ldts").as("__g_ldts"))
              .agg(Hashing.maHashdiff(payloadIn, s.maKeys.map(col))(newCfg).as("__new_hd"))
            df = df.join(grouped,
              df(s.hashkey) === col("__g_hk") && df("ldts") === col("__g_ldts"), "left")
              .withColumn(hd, ghostGuard(hd, oldCfg, newCfg)(col("__new_hd")))
              .drop("__g_hk", "__g_ldts", "__new_hd")
          } else {
            df = df.withColumn(hd,
              ghostGuard(hd, oldCfg, newCfg)(Hashing.hashdiff(payloadIn)(newCfg)))
          }
        }
        df.withColumn(s.hashkey,
            ghostGuard(s.hashkey, oldCfg, newCfg)(
              requireMapped(col("__new_hk"), col(s.hashkey), s.name, s.parent)))
          .drop("__old_hk", "__new_hk")
          .select(df0.columns.map(col).toIndexedSeq: _*)
      }
    }

    // success: drop the checkpoint map tables. On a mid-rehash FAILURE they
    // are deliberately KEPT — they are the only durable old→new translation
    // left once parents are rewritten; dropping them would strand children
    // with stale keys and no recovery path.
    (hubs.map(_.name) ++ links.map(_.name)).foreach(n => store.drop(s"__rehash_map_$n"))
  }

  /** YAML front end matching `rehash_all_rdv_entities.sql`'s document:
    * sections hubs / links / satellites / ma_satellites / nh_satellites. */
  def rehashAllFromYaml(store: TableStore, yaml: String,
                        oldCfg: HashConfig, newCfg: HashConfig): Unit = {
    val doc = graft.meta.YamlLite.parse(yaml).asInstanceOf[Map[String, Any]]
    def list(k: String): Seq[Map[String, Any]] = doc.get(k) match {
      case Some(l: List[_]) => l.map(_.asInstanceOf[Map[String, Any]])
      case _ => Nil
    }
    def strs(v: Any): Seq[String] = v match {
      case l: List[_] => l.map(_.toString)
      case null => Nil
      case s => Seq(s.toString)
    }
    val hubs = list("hubs").map(h =>
      HubRehash(h("name").toString, h("hashkey").toString, strs(h("business_keys"))))
    val links = list("links").map { l =>
      LinkRehash(l("name").toString, l("link_hashkey").toString,
        l("hub_config").asInstanceOf[List[Any]].map { hc =>
          val m = hc.asInstanceOf[Map[String, Any]]
          LinkHubRef(m("hub_hashkey").toString, m("hub_name").toString, strs(m("business_keys")))
        },
        strs(l.getOrElse("additional_hash_input_cols", Nil)))
    }
    val sats =
      list("satellites").map(s => SatRehash(s("name").toString, s("hashkey").toString,
        Some(s("hashdiff").toString), strs(s("payload")), s("parent_entity").toString)) ++
      list("ma_satellites").map(s => SatRehash(s("name").toString, s("hashkey").toString,
        Some(s("hashdiff").toString), strs(s("payload")), s("parent_entity").toString,
        maKeys = strs(s("ma_keys")))) ++
      list("nh_satellites").map(s => SatRehash(s("name").toString, s("hashkey").toString,
        None, Nil, s("parent_entity").toString))
    rehashAll(store, hubs, links, sats, oldCfg, newCfg)
  }
}

/** S8 — PIT cleanup: delete PIT rows whose snapshot was deactivated in the
  * snapshot control table (reference `macros/hooks/clean_up_pits.sql:128-136`
  * — `DELETE FROM pit WHERE sdts NOT IN (SELECT sdts FROM snap WHERE
  * is_active)`). Keeps PIT size O(active snapshots) = O(log t) under the
  * logarithmic retention logic. */
object PitCleaner {
  def cleanUp(store: TableStore, pitTable: String, snapshotTable: String,
              sdts: String = "sdts", trigger: String = "is_active"): Long = {
    val active = store.read(snapshotTable).filter(col(trigger)).select(sdts)
    var kept = 0L
    store.rewrite(pitTable) { pit =>
      val keep = pit.join(active, Seq(sdts), "left_semi")
      kept = keep.count()
      keep
    }
    kept
  }

  /** Partition-pruned variant for a PIT stored `partitionBy(sdts)`: the
    * DELETE drops whole `sdts=` directories — O(deactivated snapshots), no
    * surviving row read or rewritten. This is the layout PITs should use at
    * scale: every maintenance op (cleanup, snapshot rebuild) is keyed by
    * sdts, and the snapshot count is O(log t) under logarithmic retention.
    * Returns the number of partitions dropped. */
  def cleanUpPartitioned(store: TableStore, pitTable: String, snapshotTable: String,
                         sdts: String = "sdts", trigger: String = "is_active"): Long = {
    import org.apache.spark.sql.functions.col
    val active = store.read(snapshotTable).filter(col(trigger))
      .select(col(sdts).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val doomed = store.partitionValues(pitTable, sdts).filterNot(active.contains)
    store.dropPartitions(pitTable, sdts, doomed)
  }
}
