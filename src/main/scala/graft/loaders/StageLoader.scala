package graft.loaders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.expr.{GhostRecords, HashConfig, Hashing, SystemColumns}
import graft.expr.SystemColumns._

/** Stage configuration — the Scala equivalent of the reference's stage macro
  * metadata (reference `macros/staging/stage.sql:8-67`,
  * `macros/staging/databricks/stage.sql:190-634`).
  */
/** One hashkey/hashdiff definition. With `excludeColumns = true` the spec
  * inverts (reference `stage_processing_macros.sql:177-212`): hash ALL
  * source columns except the listed ones (in source column order — order is
  * part of the hash bytes). */
final case class HashColumnSpec(
    alias: String,
    columns: Seq[String],
    isHashdiff: Boolean = false,
    rtrimHashdiff: Boolean = false,
    excludeColumns: Boolean = false)

/** `!x` → literal, anything else → SQL expression / column name —
  * the reference's as_constant convention
  * (`macros/internal/metadata_processing/as_constant.sql:7-34`). */
object ColumnValue {
  def toColumn(v: String): Column =
    if (v.startsWith("!")) lit(v.drop(1)) else expr(v)
}

/** Derived column (P4, reference `macros/staging/derive_columns.sql:7-66`);
  * a multi-value list compiles to CONCAT(a,'||',b). */
final case class DerivedColumn(name: String, values: Seq[String]) {
  def column: Column =
    if (values.size == 1) ColumnValue.toColumn(values.head)
    else concat_ws("||", values.map(ColumnValue.toColumn): _*)
}
object DerivedColumn {
  def apply(name: String, value: String): DerivedColumn = DerivedColumn(name, Seq(value))
}

/** Prejoin (J4, reference `macros/staging/databricks/stage.sql:263-352`):
  * enrich the stage with columns from another relation via (default left)
  * equi-join. */
final case class Prejoin(
    ref: DataFrame,
    extract: Seq[(String, String)], // (refCol, alias)
    on: Seq[(String, String)],      // (stageCol, refCol)
    joinType: String = "left")

/** Multi-active config (reference `stage.sql:402-444`): hashdiffs are
  * computed per (mainHashkey, ldts) group, ordered by the MA keys. */
final case class MultiActiveConfig(maKeys: Seq[String], mainHashkey: String)

final case class StageConfig(
    ldts: String,
    rsrc: String,
    hashedColumns: Seq[HashColumnSpec] = Nil,
    derivedColumns: Seq[DerivedColumn] = Nil,
    prejoins: Seq[Prejoin] = Nil,
    missingColumns: Map[String, DataType] = Map.empty,
    multiActive: Option[MultiActiveConfig] = None,
    enableGhostRecords: Boolean = true,
    includeSourceColumns: Boolean = true)

/** Builds the staging pipeline: system columns → missing columns → prejoins
  * → derived columns → hashkeys/hashdiffs → ghost records.
  * CTE chain mirrored from `macros/staging/databricks/stage.sql:190-634`.
  */
object StageLoader {

  def build(source: DataFrame, cfg: StageConfig, isIncremental: Boolean = false)(
      implicit hc: HashConfig = Hashing.Default): DataFrame = {

    // ldts_rsrc_data (stage.sql:216-217): normalize to timestamp/string
    var df = source
      .withColumn(LdtsAlias, ColumnValue.toColumn(cfg.ldts).cast("timestamp"))
      .withColumn(RsrcAlias, ColumnValue.toColumn(cfg.rsrc).cast("string"))

    // P5 — missing columns re-added as typed NULLs (stage.sql:241-260)
    cfg.missingColumns.foreach { case (name, dt) =>
      if (!df.columns.contains(name)) df = df.withColumn(name, lit(null).cast(dt))
    }

    // J4 — prejoins (stage.sql:263-352)
    cfg.prejoins.foreach { pj =>
      val r = pj.extract.foldLeft(pj.ref)((d, ea) => d.withColumnRenamed(ea._1, ea._2))
      val rproj = r.select((pj.extract.map(_._2) ++ pj.on.map(_._2)).distinct.map(col): _*)
      val cond = pj.on.map { case (l, rr) => df(l) === rproj(rr) }.reduce(_ && _)
      df = df.join(rproj, cond, pj.joinType).drop(pj.on.map(_._2).filterNot(c => pj.extract.exists(_._2 == c)): _*)
    }

    // P4 — derived columns (derive_columns.sql:7-66)
    cfg.derivedColumns.foreach { dc => df = df.withColumn(dc.name, dc.column) }

    // hashed_columns (stage.sql:354-460); exclude-specs resolve against the
    // ORIGINAL source columns (stage_processing_macros.sql:177-212), and all
    // inputs get H7 datatype normalization (get_field_hash_by_datatype.sql)
    val sourceCols = source.columns.toSeq
    def inputs(s: HashColumnSpec): Seq[Column] = {
      val names = if (s.excludeColumns) {
        // exclusions resolve case-insensitively, like every other analyzer
        // column reference; an exclusion matching nothing is a spec typo —
        // fail loudly instead of silently hashing the column it meant to drop
        s.columns.foreach { ex =>
          if (!sourceCols.exists(_.equalsIgnoreCase(ex)))
            throw new IllegalArgumentException(
              s"exclude column '$ex' not found among ${sourceCols.mkString(", ")}")
        }
        sourceCols.filterNot(c => s.columns.exists(_.equalsIgnoreCase(c)))
      } else s.columns
      Hashing.hashInputs(df, names)
    }
    val (maSpecs, plainSpecs) = cfg.hashedColumns.partition(s => s.isHashdiff && cfg.multiActive.isDefined)
    plainSpecs.foreach { s =>
      val c =
        if (s.isHashdiff) Hashing.hashdiff(inputs(s), s.rtrimHashdiff)
        else Hashing.hashkey(inputs(s))
      df = df.withColumn(s.alias, c)
    }
    // multi-active hashdiffs: grouped agg + join back (stage.sql:402-444)
    cfg.multiActive.foreach { ma =>
      if (maSpecs.nonEmpty) {
        val aggs = maSpecs.map(s =>
          Hashing.maHashdiff(inputs(s), ma.maKeys.map(col)).as(s.alias))
        val grouped = df.groupBy(col(ma.mainHashkey), col(LdtsAlias))
          .agg(aggs.head, aggs.tail: _*)
        df = df.join(grouped, Seq(ma.mainHashkey, LdtsAlias), "left")
      }
    }

    // include_source_columns=false (stage.sql:109-155,610-612): keep only the
    // added columns — system ldts/rsrc, missing, prejoined, derived, hashed —
    // and drop the source-originated inputs from the final projection
    if (!cfg.includeSourceColumns) {
      val kept = Set(LdtsAlias, RsrcAlias) ++
        cfg.missingColumns.keys ++
        cfg.prejoins.flatMap(_.extract.map(_._2)) ++
        cfg.derivedColumns.map(_.name) ++
        cfg.hashedColumns.map(_.alias)
      val keptLower = kept.map(_.toLowerCase)
      df = df.select(df.columns.filter(c => keptLower.contains(c.toLowerCase)).map(col).toIndexedSeq: _*)
    }

    // U2 — ghost records on first build only (stage.sql:469-631)
    if (cfg.enableGhostRecords && !isIncremental) {
      val hashAliases = cfg.hashedColumns.map(_.alias).toSet
      def ghost(kind: GhostRecords.Kind): DataFrame = {
        val (ts, rs) = kind match {
          case GhostRecords.Unknown => (beginningOfAllTimesTs, UnknownRsrc)
          case GhostRecords.Error   => (endOfAllTimesTs, ErrorRsrc)
        }
        val cols = df.schema.fields.map { f =>
          val c = f.name match {
            case LdtsAlias                          => ts
            case RsrcAlias                          => lit(rs)
            case n if hashAliases.contains(n)       => GhostRecords.hashValueFor(kind)
            case _                                  => GhostRecords.valueFor(f.dataType, kind)
          }
          c.cast(f.dataType).as(f.name)
        }
        df.sparkSession.range(1).select(cols.toIndexedSeq: _*)
      }
      df = df.unionByName(ghost(GhostRecords.Unknown)).unionByName(ghost(GhostRecords.Error))
    }
    df
  }
}
