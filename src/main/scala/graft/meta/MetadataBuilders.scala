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

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case null         => Map.empty
    case other => throw new IllegalArgumentException(s"expected mapping, got $other")
  }

  private def asList(v: Any): List[Any] = v match {
    case l: List[_] => l
    case null       => Nil
    case s          => List(s)
  }

  private def strings(v: Any): Seq[String] = asList(v).map(_.toString)

  /** `stage(yaml_metadata=…)`: build the full stage DataFrame.
    * @param resolve  model name → DataFrame (dbt's ref()/source()) */
  def stage(yaml: String, resolve: String => DataFrame,
            isIncremental: Boolean = false)(
      implicit hc: HashConfig = Hashing.Default): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    def req(k: String): Any =
      m.getOrElse(k, throw new IllegalArgumentException(s"stage metadata: required parameter '$k' missing"))

    val sourceModel = req("source_model") match {
      // {'source_name': 'table'} source() syntax → resolve "source_name.table"
      case mm: Map[_, _] =>
        val (s, t) = mm.head.asInstanceOf[(String, Any)]
        s"$s.$t"
      case s => s.toString
    }

    val hashed = asMap(m.getOrElse("hashed_columns", null)).toSeq.map {
      case (alias, cols: List[_]) => HashColumnSpec(alias, cols.map(_.toString))
      case (alias, one: String)   => HashColumnSpec(alias, Seq(one))
      case (alias, spec) =>
        val sm = asMap(spec)
        HashColumnSpec(alias,
          strings(sm.getOrElse("columns", Nil)),
          isHashdiff = sm.get("is_hashdiff").contains(true),
          rtrimHashdiff = sm.get("use_rtrim").contains(true),
          excludeColumns = sm.get("exclude_columns").contains(true))
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
      enableGhostRecords = !m.get("enable_ghost_records").contains(false),
      includeSourceColumns = !m.get("include_source_columns").contains(false))
    StageLoader.build(resolve(sourceModel), cfg, isIncremental)
  }

  /** `hub(yaml_metadata=…)` / `link(…)`: source_models + keys → records. */
  def hub(yaml: String, resolve: String => DataFrame,
          target: Option[DataFrame]): DataFrame = {
    val m = asMap(YamlLite.parse(yaml))
    val hashkey = m("hashkey").toString
    val businessKeys = strings(m("business_keys"))
    val sources = asList(m("source_models")).map { sm =>
      val s = asMap(sm)
      EntitySource(
        resolve(s("name").toString),
        hkColumn = Some(s.getOrElse("hk_column", hashkey).toString),
        keyColumns = strings(s.getOrElse("bk_columns", businessKeys)),
        rsrcStatics = strings(s.getOrElse("rsrc_static", Nil)))
    }
    HubLoader.records(sources, hashkey, businessKeys, target,
      disableHwm = m.get("disable_hwm").contains(true))
  }
}
