package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DataType

import graft.expr.{HashConfig, Hashing}
import graft.loaders._

/** Builds loader configurations from the reference's YAML metadata documents
  * (the `yaml_metadata` parameter every reference macro accepts —
  * `macros/internal/metadata_processing/yaml_metadata_parser.sql` +
  * `macros/staging/stage.sql:8-67` for key names). A datavault4dbt user's
  * existing metadata blocks drive graft loaders unchanged.
  */
object MetadataBuilders {

  private[meta] def asMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case null         => Map.empty
    case other => throw new IllegalArgumentException(s"expected mapping, got $other")
  }

  private[meta] def asList(v: Any): List[Any] = v match {
    case l: List[_] => l
    case null       => Nil
    case s          => List(s)
  }

  private[meta] def strings(v: Any): Seq[String] = asList(v).map(_.toString)

  /** `source_model` in either string form or the `{'source_name': 'table'}`
    * source() map form → the resolvable name. ONE home for this rule: the
    * YamlVault dependency extractor and the stage builder must agree on the
    * external name or the DAG edge and the build's resolve() diverge. */
  private[meta] def sourceModelName(v: Any): String = v match {
    case mm: Map[_, _] =>
      val (s, t) = mm.head.asInstanceOf[(String, Any)]
      s"$s.$t"
    case s => s.toString
  }

  /** `stage(yaml_metadata=…)`: build the full stage DataFrame.
    * @param resolve  model name → DataFrame (dbt's ref()/source()) */
  def stage(yaml: String, resolve: String => DataFrame,
            isIncremental: Boolean = false)(
      implicit hc: HashConfig = Hashing.Default): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    def req(k: String): Any =
      m.getOrElse(k, throw new IllegalArgumentException(s"stage metadata: required parameter '$k' missing"))

    val sourceModel = sourceModelName(req("source_model"))

    val hashed = asMap(m.getOrElse("hashed_columns", null)).toSeq.map {
      case (alias, cols: List[_]) => HashColumnSpec(alias, cols.map(_.toString))
      case (alias, one: String)   => HashColumnSpec(alias, Seq(one))
      case (alias, spec) =>
        val sm = asMap(spec)
        HashColumnSpec(alias,
          strings(sm.getOrElse("columns", Nil)),
          isHashdiff = sm.get("is_hashdiff").exists(boolVal),
          rtrimHashdiff = sm.get("use_rtrim").exists(boolVal),
          excludeColumns = sm.get("exclude_columns").exists(boolVal))
    }

    val derived = asMap(m.getOrElse("derived_columns", null)).toSeq.map {
      case (name, v: String)  => DerivedColumn(name, Seq(v))
      case (name, vs: List[_]) => DerivedColumn(name, vs.map(_.toString))
      case (name, spec) =>
        DerivedColumn(name, strings(asMap(spec).getOrElse("value", Nil)))
    }

    val prejoins = asList(m.getOrElse("prejoined_columns", null)).map { pj =>
      val pm = asMap(pj)
      val refName = pm.getOrElse("ref_model",
        pm.getOrElse("src_name", throw new IllegalArgumentException(
          "prejoined_columns entry needs ref_model"))).toString
      val thisCols = strings(pm("this_column_name"))
      val refCols = strings(pm("ref_column_name"))
      val extracted = strings(pm.getOrElse("extract_columns", Nil)).map(c => (c, c))
      Prejoin(resolve(refName), extracted, thisCols.zip(refCols))
    }

    val missing = asMap(m.getOrElse("missing_columns", null)).map {
      case (name, dt) => name -> DataType.fromDDL(dt.toString)
    }

    val multiActive = m.get("multi_active_config").map { ma =>
      val mm = asMap(ma)
      MultiActiveConfig(strings(mm("multi_active_key")),
        mm("main_hashkey_column").toString)
    }

    val cfg = StageConfig(
      ldts = req("ldts").toString,
      rsrc = req("rsrc").toString,
      hashedColumns = hashed,
      derivedColumns = derived,
      prejoins = prejoins,
      missingColumns = missing,
      multiActive = multiActive,
      enableGhostRecords = boolDefaultTrue(m, "enable_ghost_records"),
      includeSourceColumns = boolDefaultTrue(m, "include_source_columns"))
    StageLoader.build(resolve(sourceModel), cfg, isIncremental)
  }

  /** YAML booleans survive quoting/casing as STRINGS ('FALSE', "True");
    * every boolean-ish knob must parse them, not just bare true/false */
  private def boolVal(v: Any): Boolean = v match {
    case b: Boolean => b
    case s          => s != null && s.toString.equalsIgnoreCase("true")
  }

  private def bool(m: Map[String, Any], k: String): Boolean =
    m.get(k).exists(boolVal)

  /** true unless the key is present and explicitly false(-ish) */
  private def boolDefaultTrue(m: Map[String, Any], k: String): Boolean =
    m.get(k).forall(boolVal)

  /** Restrict parsed source-model entries to the runner's effective
    * selection (execution-aware loading, `source_models.sql:40-62`) —
    * `None` = no restriction. Empty results fail loudly: the runner's
    * fallbacks guarantee a non-empty effective list, so an empty filter
    * means the caller passed names that do not match the YAML. */
  private def restrict(entries: Seq[(String, Map[String, Any])],
                       onlySources: Option[Set[String]]): Seq[(String, Map[String, Any])] =
    onlySources match {
      case None => entries
      case Some(sel) =>
        val kept = entries.filter(e => sel(e._1))
        require(kept.nonEmpty,
          s"onlySources ${sel.mkString(", ")} matches none of ${entries.map(_._1).mkString(", ")}")
        kept
    }

  /** The reference accepts `source_models` as a mapping name→config, a list
    * (of names or of configs carrying a `name` key), or one plain name
    * (`macros/supporting/source_models.sql:11-36`). Normalized to
    * (modelName, config) pairs in document order. */
  private[meta] def sourceModelEntries(v: Any): Seq[(String, Map[String, Any])] = v match {
    case null      => Nil
    case s: String => Seq(s -> Map.empty)
    case l: List[_] => l.map {
      case s: String => s -> Map.empty[String, Any]
      case other =>
        val m = asMap(other)
        m.getOrElse("name", throw new IllegalArgumentException(
          "source_models list entry needs a 'name' key")).toString -> m
    }
    case mm: Map[_, _] =>
      asMap(mm).toSeq.map { case (name, cfg) => name -> asMap(cfg) }
    case other => throw new IllegalArgumentException(s"bad source_models: $other")
  }

  /** `hub(yaml_metadata=…)`: source_models + keys → records
    * (reference `macros/tables/hub.sql`). */
  def hub(yaml: String, resolve: String => DataFrame,
          target: Option[DataFrame],
          onlySources: Option[Set[String]] = None): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val hashkey = m("hashkey").toString
    val businessKeys = strings(m("business_keys"))
    val sources = restrict(sourceModelEntries(m("source_models")), onlySources).map { case (name, s) =>
      EntitySource(
        resolve(name),
        hkColumn = Some(s.getOrElse("hk_column", hashkey).toString),
        keyColumns = strings(s.getOrElse("bk_columns", businessKeys)),
        rsrcStatics = strings(s.getOrElse("rsrc_static", Nil)))
    }
    HubLoader.records(sources, hashkey, businessKeys, target,
      disableHwm = bool(m, "disable_hwm"))
  }

  /** `link(yaml_metadata=…)` (reference `macros/tables/link.sql:9`):
    * link_hashkey + foreign_hashkeys, per-source `fk_columns`/`link_hk`. */
  def link(yaml: String, resolve: String => DataFrame,
           target: Option[DataFrame],
           onlySources: Option[Set[String]] = None): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val linkHashkey = m("link_hashkey").toString
    val fks = strings(m("foreign_hashkeys"))
    val sources = restrict(sourceModelEntries(m("source_models")), onlySources).map { case (name, s) =>
      EntitySource(
        resolve(name),
        hkColumn = Some(s.getOrElse("link_hk", linkHashkey).toString),
        keyColumns = strings(s.getOrElse("fk_columns", fks)),
        rsrcStatics = strings(s.getOrElse("rsrc_static", Nil)))
    }
    LinkLoader.records(sources, linkHashkey, fks, target,
      disableHwm = bool(m, "disable_hwm"))
  }

  /** `nh_link(yaml_metadata=…)` (reference `macros/tables/nh_link.sql:9`). */
  def nhLink(yaml: String, resolve: String => DataFrame,
             target: Option[DataFrame],
             onlySources: Option[Set[String]] = None): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val linkHashkey = m("link_hashkey").toString
    val fks = strings(m.getOrElse("foreign_hashkeys", Nil))
    val sources = restrict(sourceModelEntries(m("source_models")), onlySources).map { case (name, s) =>
      EntitySource(
        resolve(name),
        hkColumn = Some(s.getOrElse("link_hk", linkHashkey).toString),
        keyColumns = strings(s.getOrElse("fk_columns", fks)),
        rsrcStatics = strings(s.getOrElse("rsrc_static", Nil)))
    }
    NhLinkLoader.records(sources, linkHashkey, fks,
      payload = strings(m.getOrElse("payload", Nil)), target,
      unionDistinct = m.get("union_strategy").exists(_.toString == "distinct"),
      disableHwm = bool(m, "disable_hwm"))
  }

  /** `ref_hub(yaml_metadata=…)` (reference `macros/tables/ref_hub.sql`). */
  def refHub(yaml: String, resolve: String => DataFrame,
             target: Option[DataFrame],
             onlySources: Option[Set[String]] = None): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val refKeys = strings(m("ref_keys"))
    val sources = restrict(sourceModelEntries(m("source_models")), onlySources).map { case (name, s) =>
      EntitySource(resolve(name), hkColumn = None,
        keyColumns = strings(s.getOrElse("ref_keys", refKeys)),
        rsrcStatics = strings(s.getOrElse("rsrc_static", Nil)))
    }
    RefHubLoader.records(sources, refKeys, target)
  }

  /** `sat_v0(yaml_metadata=…)` (reference `macros/tables/sat_v0.sql:9`);
    * with `parent_ref_keys` instead of `parent_hashkey` this is
    * `ref_sat_v0.sql` (identical shape, composite keys). */
  def satV0(yaml: String, resolve: String => DataFrame,
            target: Option[DataFrame]): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val keys = m.get("parent_hashkey").map(h => Seq(h.toString))
      .getOrElse(strings(m("parent_ref_keys")))
    SatV0Loader.records(
      resolve(m("source_model").toString),
      keys,
      dedupCol = m.get("src_hashdiff").map(_.toString),
      payload = strings(m.getOrElse("src_payload", Nil)),
      target = target,
      singleBatch = bool(m, "source_is_single_batch"),
      disableHwm = bool(m, "disable_hwm"),
      additionalColumns = strings(m.getOrElse("additional_columns", Nil)))
  }

  /** `sat_v1(yaml_metadata=…)` / `ref_sat_v1(…)` (reference
    * `macros/tables/sat_v1.sql:9`, `ref_sat_v1.sql`). */
  def satV1(yaml: String, resolve: String => DataFrame): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val v0 = resolve(m.get("sat_v0").map(_.toString)
      .getOrElse(m("ref_sat_v0").toString))
    val keys = m.get("hashkey").map(h => Seq(h.toString))
      .getOrElse(strings(m("ref_keys")))
    SatV1Loader.build(v0, keys,
      hashdiff = m.get("hashdiff").map(_.toString),
      addIsCurrentFlag = bool(m, "add_is_current_flag"),
      includePayload = boolDefaultTrue(m, "include_payload"),
      ledtsAlias = m.getOrElse("ledts_alias", graft.expr.SystemColumns.LedtsAlias).toString)
  }

  /** `ma_sat_v0(yaml_metadata=…)` (reference `macros/tables/ma_sat_v0.sql:9`). */
  def maSatV0(yaml: String, resolve: String => DataFrame,
              target: Option[DataFrame]): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    MaSatV0Loader.records(
      resolve(m("source_model").toString),
      hashkey = m("parent_hashkey").toString,
      hashdiff = m("src_hashdiff").toString,
      maKeys = strings(m("src_ma_key")),
      payload = strings(m.getOrElse("src_payload", Nil)),
      target = target,
      singleBatch = bool(m, "source_is_single_batch"),
      disableHwm = bool(m, "disable_hwm"))
  }

  /** `ma_sat_v1(yaml_metadata=…)` (reference `macros/tables/ma_sat_v1.sql:9`). */
  def maSatV1(yaml: String, resolve: String => DataFrame): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    MaSatV1Loader.build(
      resolve(m("sat_v0").toString),
      hashkey = m("hashkey").toString,
      hashdiff = m("hashdiff").toString,
      maKeys = strings(m("ma_attribute")),
      addIsCurrentFlag = bool(m, "add_is_current_flag"),
      ledtsAlias = m.getOrElse("ledts_alias", graft.expr.SystemColumns.LedtsAlias).toString)
  }

  /** `nh_sat(yaml_metadata=…)` (reference `macros/tables/nh_sat.sql:9`). */
  def nhSat(yaml: String, resolve: String => DataFrame,
            target: Option[DataFrame]): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    NhSatLoader.records(
      resolve(m("source_model").toString),
      hashkey = m("parent_hashkey").toString,
      payload = strings(m.getOrElse("src_payload", Nil)),
      target = target,
      singleBatch = bool(m, "source_is_single_batch"))
  }

  /** `eff_sat_v0(yaml_metadata=…)` (reference `macros/tables/eff_sat_v0.sql:9`). */
  def effSatV0(yaml: String, resolve: String => DataFrame,
               target: Option[DataFrame]): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    EffSatLoader.records(
      resolve(m("source_model").toString),
      hashkey = m("tracked_hashkey").toString,
      target = target,
      isActiveAlias = m.getOrElse("is_active_alias", "is_active").toString,
      singleBatch = bool(m, "source_is_single_batch"),
      disableHwm = bool(m, "disable_hwm"),
      additionalColumns = strings(m.getOrElse("additional_columns", Nil)))
  }

  /** `rec_track_sat(yaml_metadata=…)` (reference
    * `macros/tables/rec_track_sat.sql:9`). */
  def recTrackSat(yaml: String, resolve: String => DataFrame,
                  target: Option[DataFrame],
                  onlySources: Option[Set[String]] = None): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val hashkey = m("tracked_hashkey").toString
    val sources = restrict(sourceModelEntries(m("source_models")), onlySources).map { case (name, s) =>
      // rsrc_static may be one pattern or a list (rec_track_sat.sql:142-162)
      (resolve(name), s.getOrElse("hk_column", hashkey).toString, name,
        strings(s.getOrElse("rsrc_static", Nil)))
    }
    RecTrackSatLoader.records(sources, hashkey, target,
      stgAlias = m.getOrElse("src_stg", "stg").toString,
      disableHwm = bool(m, "disable_hwm"))
  }

  /** `pit(yaml_metadata=…)` (reference `macros/tables/pit.sql:9`): each
    * sat_names entry resolves to a satellite relation; a satellite without
    * the ledts column (a v0 sat) is end-dated inline, like the reference. */
  def pit(yaml: String, resolve: String => DataFrame,
          target: Option[DataFrame])(
      implicit hc: HashConfig = Hashing.Default): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val ledts = m.getOrElse("ledts", graft.expr.SystemColumns.LedtsAlias).toString
    val sats = strings(m("sat_names")).map { name =>
      val df = resolve(name)
      PitSatellite(name, df, hasLedts = df.columns.contains(ledts))
    }
    PitLoader.records(
      trackedEntity = resolve(m("tracked_entity").toString),
      hashkey = m("hashkey").toString,
      satellites = sats,
      snapshots = resolve(m("snapshot_relation").toString),
      dimensionKey = m("dimension_key").toString,
      target = target,
      sdtsAlias = m.getOrElse("sdts", graft.expr.SystemColumns.SdtsAlias).toString,
      snapshotTriggerColumn = m.get("snapshot_trigger_column").map(_.toString)
        .orElse(Some("is_active")),
      customRsrc = m.get("custom_rsrc").map(_.toString),
      pitType = m.get("pit_type").map(_.toString),
      snapshotOptimization = bool(m, "snapshot_optimization"))
  }

  /** `ref_table(yaml_metadata=…)` (reference `macros/tables/ref_table.sql:1`):
    * ref_satellites as one name, a list of names, or a mapping
    * name → {include: [...]} / {exclude: [...]} / [columns]. */
  def refTable(yaml: String, resolve: String => DataFrame): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val hubDf = resolve(m("ref_hub").toString)
    // reference derives the ref keys from the hub relation (ref_table.sql:
    // ref_key_cols = hub columns minus system); an explicit ref_keys wins
    val refKeys = m.get("ref_keys").map(strings).getOrElse(
      hubDf.columns.toSeq.filterNot(c =>
        c == graft.expr.SystemColumns.LdtsAlias || c == graft.expr.SystemColumns.RsrcAlias))
    val system = Set(graft.expr.SystemColumns.LdtsAlias, graft.expr.SystemColumns.RsrcAlias,
      graft.expr.SystemColumns.LedtsAlias) ++ refKeys ++
      strings(m.getOrElse("sat_columns_to_exclude", Nil))
    def payload(df: DataFrame, spec: Any): Seq[String] = spec match {
      case null => df.columns.toSeq.filterNot(c =>
        system.exists(_.equalsIgnoreCase(c)) || c.startsWith("hd_") || c == "hashdiff")
      case l: List[_] => l.map(_.toString)
      case mm: Map[_, _] =>
        val sm = asMap(mm)
        sm.get("include").map(strings).getOrElse {
          val excl = strings(sm.getOrElse("exclude", Nil)).map(_.toLowerCase).toSet
          df.columns.toSeq.filterNot(c => excl.contains(c.toLowerCase) ||
            system.exists(_.equalsIgnoreCase(c)))
        }
      case s => Seq(s.toString)
    }
    val sats = m("ref_satellites") match {
      case s: String => Seq(RefTableLoader.RefSat(resolve(s), payload(resolve(s), null)))
      case l: List[_] => l.map { n =>
        val df = resolve(n.toString); RefTableLoader.RefSat(df, payload(df, null))
      }
      case mm: Map[_, _] => asMap(mm).toSeq.map { case (name, spec) =>
        val df = resolve(name); RefTableLoader.RefSat(df, payload(df, spec))
      }
      case other => throw new IllegalArgumentException(s"bad ref_satellites: $other")
    }
    val historized = m.getOrElse("historized", "latest").toString
    RefTableLoader.build(
      hubDf, refKeys, sats, historized,
      snapshots = m.get("snapshot_relation").map(r => resolve(r.toString)),
      snapshotTrigger = m.getOrElse("snapshot_trigger_column", "is_active").toString)
  }

  /** `control_snap_v0(yaml_metadata=…)` (reference
    * `macros/tables/control_snap_v0.sql:9`). */
  def controlSnapV0(yaml: String, spark: org.apache.spark.sql.SparkSession,
                    target: Option[DataFrame] = None): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    ControlSnapV0Loader.build(spark,
      startDate = m("start_date").toString,
      dailySnapshotTime = m.getOrElse("daily_snapshot_time", "00:00:00").toString,
      endDate = m.get("end_date").map(_.toString),
      sdtsAlias = m.getOrElse("sdts_alias", graft.expr.SystemColumns.SdtsAlias).toString,
      target = target)
  }

  /** `control_snap_v1(yaml_metadata=…)` (reference
    * `macros/tables/control_snap_v1.sql:9`): `log_logic` as one mapping →
    * the default trigger column, or a list of {column: config} mappings →
    * one trigger column each (`databricks/control_snap_v1.sql:4-18`). */
  def controlSnapV1(yaml: String, resolve: String => DataFrame,
                    referenceTs: Option[String] = None): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val sdts = m.getOrElse("sdts_alias", graft.expr.SystemColumns.SdtsAlias).toString
    def interval(v: Any): IntervalLogic = {
      val im = asMap(v)
      IntervalLogic(
        duration = im.get("duration").map(_.toString.toInt).getOrElse(0),
        unit = im.getOrElse("unit", "DAY").toString,
        forever = im.get("forever").exists {
          case b: Boolean => b
          case s          => s.toString.equalsIgnoreCase("true")
        })
    }
    def trigger(column: String, cfg: Map[String, Any]): SnapshotTrigger =
      SnapshotTrigger(column,
        daily = cfg.get("daily").map(interval),
        weekly = cfg.get("weekly").map(interval),
        monthly = cfg.get("monthly").map(interval),
        yearly = cfg.get("yearly").map(interval))
    val triggers = m.getOrElse("log_logic", null) match {
      case null => Nil
      case l: List[_] => l.map { item =>
        val im = asMap(item)
        require(im.size == 1, s"log_logic list entries must be {column: config}, got $im")
        val (colName, cfg) = im.head
        trigger(colName, asMap(cfg))
      }
      case mm => Seq(trigger("is_active", asMap(mm)))
    }
    ControlSnapV1Loader.buildMulti(resolve(m("control_snap_v0").toString),
      triggers, sdtsAlias = sdts, referenceTs = referenceTs)
  }

  /** dbt schema.yml test definitions → one constraint report
    * ([[graft.quality.VaultConstraints]]). Supports the three generic tests
    * the reference's documented contract uses — `not_null`, `unique`,
    * `relationships: {to: ref('model'), field: col}` — as column tests,
    * plus model-level `unique: {columns: [...]}` for composite satellite
    * keys. `ref('x')` / `source('a','b')` wrappers resolve by their last
    * argument. */
  def tests(yaml: String, resolve: String => DataFrame): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    def deref(s: String): String = {
      val r = raw"""(?:ref|source)\s*\(\s*(?:'[^']*'\s*,\s*)?'([^']*)'\s*\)""".r
      s.trim match { case r(name) => name; case other => other }
    }
    val checks = asList(m.getOrElse("models", Nil)).flatMap { model =>
      val mm = asMap(model)
      val modelName = mm("name").toString
      val df = resolve(modelName)
      val columnChecks = asList(mm.getOrElse("columns", Nil)).flatMap { c =>
        val cm = asMap(c)
        val colName = cm("name").toString
        asList(cm.getOrElse("tests", Nil)).map {
          case "not_null" =>
            graft.quality.VaultConstraints.notNullViolations(
              df, Seq(colName), s"$modelName.${colName}_not_null")
          case "unique" =>
            graft.quality.VaultConstraints.uniqueViolations(
              df, Seq(colName), s"$modelName.${colName}_unique")
          case rel =>
            val rm = asMap(rel)
            require(rm.keySet == Set("relationships"),
              s"unsupported column test $rel (want not_null/unique/relationships)")
            val cfg = asMap(rm("relationships"))
            graft.quality.VaultConstraints.subsetViolations(
              df, colName, resolve(deref(cfg("to").toString)),
              cfg("field").toString, s"$modelName.${colName}_relationships")
        }
      }
      val modelChecks = asList(mm.getOrElse("tests", Nil)).map { t =>
        val tm = asMap(t)
        require(tm.keySet == Set("unique"),
          s"unsupported model test $t (want unique: {columns: [...]})")
        val cols = strings(asMap(tm("unique"))("columns"))
        graft.quality.VaultConstraints.uniqueViolations(
          df, cols, s"$modelName.${cols.mkString("_")}_unique")
      }
      columnChecks ++ modelChecks
    }
    require(checks.nonEmpty, "schema yaml declares no tests")
    graft.quality.VaultConstraints.report(checks)
  }
}
