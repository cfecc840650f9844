package graft.meta

import org.apache.spark.sql.DataFrame

import graft.expr.{HashConfig, Hashing}
import graft.runtime.{Materialization, Runner, VaultModel}

/** The dbt-manifest analogue: a set of `yaml_metadata` documents — exactly
  * the blocks a datavault4dbt user already has, one per model — compiled
  * into a [[graft.runtime.Runner]] DAG. Dependencies are EXTRACTED from the
  * YAML itself (`source_model(s)`, `sat_v0`, `tracked_entity`,
  * `snapshot_relation`, …), so topological ordering, dbt-style selection
  * and execution-aware source pruning all work without hand-wiring edges —
  * the part of the reference's operating model that dbt's graph provided
  * (`source_models.sql:40-62` consumes `selected_resources` from it).
  */
object YamlVault {
  import MetadataBuilders.{asList, asMap, sourceModelEntries, sourceModelName, strings}

  /** One model of the vault: the entity kind (= the reference macro name),
    * its yaml_metadata document, and how to materialize it. Defaults follow
    * the reference's conventions: staging and v1/reporting views stay
    * virtual, everything historized is incremental. */
  final case class ModelDef(
      name: String,
      kind: String,
      yaml: String,
      materialization: Option[Materialization] = None,
      tags: Set[String] = Set.empty)

  private val ViewKinds = Set("stage", "sat_v1", "ref_sat_v1", "ma_sat_v1",
    "ref_table", "control_snap_v1")

  private def defaultMaterialization(kind: String): Materialization =
    if (ViewKinds(kind)) Materialization.View else Materialization.Incremental

  /** a prejoin entry's model reference (`ref_model` / `src_name`) */
  private def prejoinRefs(m: Map[String, Any]): Seq[String] =
    asList(m.getOrElse("prejoined_columns", null)).flatMap { pj =>
      val pm = asMap(pj)
      pm.get("ref_model").orElse(pm.get("src_name")).map(_.toString)
    }

  /** `(deps, sourceModels)` of one document — sourceModels are the
    * PRUNABLE multi-source inputs, deps everything else. */
  def dependencies(kind: String, yaml: String): (Seq[String], Seq[String]) = {
    val m = asMap(YamlLite.parse(yaml))
    kind match {
      case "stage" =>
        (Seq(sourceModelName(m("source_model"))) ++ prejoinRefs(m), Nil)
      case "hub" | "link" | "nh_link" | "ref_hub" | "rec_track_sat" =>
        (Nil, sourceModelEntries(m("source_models")).map(_._1))
      case "sat_v0" | "ref_sat_v0" | "ma_sat_v0" | "nh_sat" | "eff_sat_v0" =>
        (Seq(m("source_model").toString), Nil)
      case "sat_v1" | "ref_sat_v1" =>
        val v0 = m.get("sat_v0").orElse(m.get("ref_sat_v0")).getOrElse(
          throw new IllegalArgumentException(
            s"$kind metadata needs sat_v0 or ref_sat_v0"))
        (Seq(v0.toString), Nil)
      case "ma_sat_v1" =>
        (Seq(m("sat_v0").toString), Nil)
      case "pit" =>
        (Seq(m("tracked_entity").toString, m("snapshot_relation").toString) ++
          strings(m("sat_names")), Nil)
      case "ref_table" =>
        val sats = m("ref_satellites") match {
          case s: String     => Seq(s)
          case l: List[_]    => l.map(_.toString)
          case mm: Map[_, _] => asMap(mm).keys.toSeq
          case other => throw new IllegalArgumentException(s"bad ref_satellites: $other")
        }
        // historized ref tables resolve their snapshot relation too — the
        // builder reads it, so the DAG must walk it (cf. the pit case)
        (m("ref_hub").toString +: (sats ++
          m.get("snapshot_relation").map(_.toString)), Nil)
      case "control_snap_v0" => (Nil, Nil)
      case "control_snap_v1" => (Seq(m("control_snap_v0").toString), Nil)
      case other =>
        throw new IllegalArgumentException(s"YamlVault: unknown model kind '$other'")
    }
  }

  /** Compile the documents into runner models. `resolve` inside each build
    * is the runner's — refs to sibling models read their materialized (or
    * ephemeral) state, anything else falls through to the runner's external
    * sources. */
  def models(defs: Seq[ModelDef])(
      implicit hc: HashConfig = Hashing.Default): Seq[VaultModel] =
    defs.map { d =>
      val (deps, srcModels) = dependencies(d.kind, d.yaml)
      VaultModel(d.name, deps = deps, sourceModels = srcModels,
        materialization = d.materialization.getOrElse(defaultMaterialization(d.kind)),
        tags = d.tags)(build(d))
    }

  private def build(d: ModelDef)(implicit hc: HashConfig): Runner.Ctx => DataFrame =
    ctx => {
      val only = Some(ctx.sources.toSet).filter(_.nonEmpty)
      d.kind match {
        case "stage" =>
          MetadataBuilders.stage(d.yaml, ctx.resolve, isIncremental = ctx.isIncremental)
        case "hub" => MetadataBuilders.hub(d.yaml, ctx.resolve, ctx.target, only)
        case "link" => MetadataBuilders.link(d.yaml, ctx.resolve, ctx.target, only)
        case "nh_link" => MetadataBuilders.nhLink(d.yaml, ctx.resolve, ctx.target, only)
        case "ref_hub" => MetadataBuilders.refHub(d.yaml, ctx.resolve, ctx.target, only)
        case "rec_track_sat" =>
          MetadataBuilders.recTrackSat(d.yaml, ctx.resolve, ctx.target, only)
        case "sat_v0" | "ref_sat_v0" =>
          MetadataBuilders.satV0(d.yaml, ctx.resolve, ctx.target)
        case "sat_v1" | "ref_sat_v1" => MetadataBuilders.satV1(d.yaml, ctx.resolve)
        case "ma_sat_v0" => MetadataBuilders.maSatV0(d.yaml, ctx.resolve, ctx.target)
        case "ma_sat_v1" => MetadataBuilders.maSatV1(d.yaml, ctx.resolve)
        case "nh_sat" => MetadataBuilders.nhSat(d.yaml, ctx.resolve, ctx.target)
        case "eff_sat_v0" => MetadataBuilders.effSatV0(d.yaml, ctx.resolve, ctx.target)
        case "pit" => MetadataBuilders.pit(d.yaml, ctx.resolve, ctx.target)
        case "ref_table" => MetadataBuilders.refTable(d.yaml, ctx.resolve)
        case "control_snap_v0" =>
          MetadataBuilders.controlSnapV0(d.yaml, ctx.spark, ctx.target)
        case "control_snap_v1" => MetadataBuilders.controlSnapV1(d.yaml, ctx.resolve)
        case other =>
          throw new IllegalArgumentException(s"YamlVault: unknown model kind '$other'")
      }
    }
}
