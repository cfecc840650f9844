package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Write-path interop for Apache Iceberg tables — the distributed
  * complement of [[IcebergRead]], sharing the metadata commit core with
  * [[IcebergFixture]] (avro manifests + versioned metadata JSON per the
  * published Iceberg Table Spec; no Iceberg library).
  *
  * Iceberg's layout twist shapes the data write: data files must CONTAIN
  * the partition source columns, while Spark's `partitionBy` drops them
  * into directory names. The writer therefore stages ONE distributed
  * `partitionBy` write over SHADOW columns (`__part_<c>` copies), so
  * every executor writes its own one-partition-tuple files in parallel
  * with the real columns intact, then moves the staged files under
  * `data/<c>=<v>/` and commits a manifest whose entries carry the decoded
  * tuple and the footer's record count.
  *
  * Modes mirror [[DeltaWrite]]: `append`, `overwrite` (status-2 every
  * previously-live file), `overwritePartitions` (status-2 only the tuples
  * being rewritten — dynamic partition overwrite). Scope: single-writer;
  * the full transform family ([[IcebergTransforms]]); NULL partition
  * values round-trip as null tuples; schema evolves via mergeSchema
  * appends and [[renameColumn]]/[[dropColumn]].
  */
object IcebergWrite {

  /** Commit `df` as the table's next snapshot; returns the snapshot id.
    *
    * `partCols` terms are either bare column names (identity) or
    * transform calls in Iceberg's SQL syntax — `bucket(8, key)`,
    * `truncate(4, s)`, `days(ts)`, `years(ts)`, `months(ts)`,
    * `hours(ts)` ([[IcebergTransforms.parseField]]); a table created
    * with transforms lays its files out per TRANSFORMED tuple while the
    * data files keep the source columns, and reads prune through the
    * same transform arithmetic.
    *
    * `mergeSchema = true` — schema evolution on write, mirroring
    * [[DeltaWrite.write]]: the incoming frame may APPEND nullable
    * columns (field ids are positional, so appending keeps every
    * existing column's id stable — the spec's add-column evolution);
    * the committed metadata carries the widened schema, and older data
    * files simply lack the new columns, which the name-resolving scan
    * serves as NULLs. Dropping/retyping stays a loud reject. */
  def write(df: DataFrame, tableDir: String, partCols: Seq[String] = Nil,
            mode: String = "append", mergeSchema: Boolean = false): Long = {
    require(Set("append", "overwrite", "overwritePartitions")(mode),
      s"unknown Iceberg write mode '$mode'")
    val spark = df.sparkSession
    val root = Paths.get(tableDir)
    val existing =
      if (Files.exists(root.resolve("metadata/version-hint.text")))
        Some(IcebergRead.snapshot(tableDir)) else None
    val snapshotId = existing.map(_ => nextSnapshotId(tableDir)).getOrElse(1L)
    val fields = existing.map(_.partitionFields)
      .getOrElse(partCols.map(IcebergTransforms.parseField))
    fields.foreach(f => require(df.schema.fieldNames.contains(f.sourceCol),
      s"partition source column ${f.sourceCol} (${f.transform.specName}) " +
        "not in the frame"))
    // the schema the commit declares: on evolution, the appended columns
    // are FORCED nullable (older files lack them — readers must be allowed
    // to produce NULLs), keeping existing fields exactly as the table had
    var commitSchema: StructType = df.schema
    existing.foreach { snap =>
      val want = snap.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      if (mergeSchema && got != want) {
        require(got.take(want.size) == want,
          s"mergeSchema can only APPEND columns (field ids are positional); " +
            s"got ${got.mkString(",")}, table has ${want.mkString(",")}")
        commitSchema = StructType(snap.schema.fields ++
          df.schema.fields.drop(want.size).map(_.copy(nullable = true)))
      } else {
        require(got == want,
          s"schema mismatch vs $tableDir metadata: got ${got.mkString(",")}, table has ${want.mkString(",")}" +
            (if (mergeSchema) "" else " (pass mergeSchema = true to append columns)"))
      }
    }

    val added = stageDataFiles(df, root, fields, snapshotId)

    val removePaths: Set[String] = mode match {
      case "append" => Set.empty
      case "overwrite" => existing.toSeq.flatMap(_.files.map(_.path)).toSet
      case "overwritePartitions" =>
        val touched = added.map(_._2).toSet
        existing.toSeq.flatMap(_.files
          .filter(f => touched(f.partitionValues)).map(_.path)).toSet
    }

    IcebergFixture.commitSnapshot(tableDir, commitSchema, fields, snapshotId,
      added, removePaths,
      operation = if (mode == "append") "append" else "overwrite")
    snapshotId
  }

  /** Distributed stage of `df`'s data files, the shared seam behind
    * [[write]], [[rewriteDataFiles]], and [[merge]]: shadow partition
    * columns keep the real ones in the data files as the spec requires;
    * per-attempt uuid staging dir (racing writers must not stage into —
    * or sweep — each other's directory); staged files are metadata-moved
    * under `data/<c>=<v>/`. Returns (absolute path, partition tuple,
    * record count, size) per file. */
  private def stageDataFiles(df: DataFrame, root: Path,
                             fields: Seq[IcebergTransforms.PartField],
                             snapshotId: Long)
      : Seq[(String, Map[String, String], Long, Long)] = {
    val spark = df.sparkSession
    val staging = root.resolve(
      f"_staging_$snapshotId%05d-${java.util.UUID.randomUUID().toString.take(8)}")
    // stamp the table's STABLE field ids into the staged parquet
    // (spark.sql.parquet.fieldId.write.enabled is on by default): after
    // a rename/drop the reader resolves columns by id, and files
    // written without ids would reject loudly under an evolved table
    val ids = IcebergFixture.assignFieldIds(root.toString, df.schema)
    val stamped = df.select(df.schema.fields.toSeq.map { f =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
        .putLong("parquet.field.id", ids(f.name).toLong).build()
      col(f.name).as(f.name, md)
    }: _*)
    val shadows = fields.map(f => s"__part_${f.name}")
    val staged0 = fields.foldLeft(stamped)((d, f) => d.withColumn(
      s"__part_${f.name}", IcebergTransforms.shadowColumn(f, df.schema)))
    val writer = staged0.write.mode("overwrite")
    (if (shadows.nonEmpty) writer.partitionBy(shadows: _*) else writer)
      .parquet(staging.toString)

    val fieldNames = fields.map(_.name)
    val conf = spark.sparkContext.hadoopConfiguration
    val added = listParquet(staging).zipWithIndex.map { case (p, i) =>
      val rel = staging.relativize(p)
      val segs = (0 until rel.getNameCount).map(rel.getName(_).toString)
      val pv = segs.dropRight(1).map { seg =>
        val eq = seg.indexOf('=')
        require(eq > 0, s"staged path $rel is not hive-layout under partitionBy")
        val c = seg.substring(0, eq).stripPrefix("__part_")
        val raw = ExternalCatalogUtils.unescapePathName(seg.substring(eq + 1))
        // a null source value transforms to a NULL tuple — the spec
        // stores it as such (manifest partition field is optional); the
        // dir name keeps hive's sentinel, the manifest is authoritative
        c -> (if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
              else raw)
      }.toMap
      require(pv.keySet == fieldNames.toSet,
        s"staged path $rel carries partitions ${pv.keySet}, expected $fieldNames")
      // re-escape when composing the target path: pv holds UNESCAPED
      // values, and a raw '/' (or '..') in a value would nest extra
      // directories / escape the table root. Same hive escaping the
      // staged writer used, so the layout matches what DeltaWrite keeps.
      val dirs = fieldNames.map(c => s"$c=${ExternalCatalogUtils.escapePathName(
        Option(pv(c)).getOrElse(ExternalCatalogUtils.DEFAULT_PARTITION_NAME))}")
      // uuid in the name: racing writers that both computed snapshotId
      // must not overwrite each other's data files before the metadata
      // CAS decides the winner
      val relOut = ("data" +: dirs).mkString("/") +
        f"/part-$snapshotId%05d-$i%05d-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
      val target = root.resolve(relOut)
      Files.createDirectories(target.getParent)
      Files.move(p, target, StandardCopyOption.REPLACE_EXISTING)
      (target.toString, pv, rowCount(conf, target), Files.size(target))
    }
    deleteRecursively(staging)
    added
  }

  /** rewriteDataFiles — Iceberg's compaction maintenance action, the
    * [[DeltaWrite.optimize]] counterpart (Spark-procedure name from the
    * Iceberg docs). Two modes, same semantics contract: NO logical row
    * changes, committed as an `operation=replace` snapshot (status-2 the
    * rewritten files, status-1 the replacements) that an append-only
    * tail rejects loudly and time travel steps over cleanly.
    *
    *  - **bin-pack** (`zorderBy = Nil`): per partition tuple, live files
    *    smaller than `targetFileBytes` are coalesced (one task — hence
    *    one file — per touched tuple).
    *  - **Z-ORDER** (1-4 columns, unpartitioned tables): ALL live files
    *    re-laid-out through the deterministic [[graft.ops.ZCluster]]
    *    core shared with Delta and the tx log.
    *
    * When the table carries ROW-LEVEL DELETES (position or equality),
    * compaction switches to a full MATERIALIZING rewrite: every live
    * file is rewritten with the deletes applied and the delete files are
    * DROPPED from the new snapshot (`carryDeletes = false`) — folding
    * accumulated MoR debt back into clean data files, which is exactly
    * why a 100 TB MoR table schedules compaction. (A partial rewrite
    * could not drop a delete file other surviving data files still
    * need.)
    *
    * Returns (live files before, live files after). */
  def rewriteDataFiles(spark: org.apache.spark.sql.SparkSession,
                       tableDir: String,
                       targetFileBytes: Long = 128L << 20,
                       zorderBy: Seq[String] = Nil): (Int, Int) = {
    import org.apache.spark.sql.functions.col
    val snap = IcebergRead.snapshot(tableDir)
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fields = snap.partitionFields
    val before = snap.files.size
    if (snap.files.isEmpty) return (0, 0)
    val materializing = snap.deletes.nonEmpty

    val rewritten: Seq[IcebergRead.DataFile] =
      if (zorderBy.nonEmpty) {
        require(fields.isEmpty,
          "z-order rewrite targets unpartitioned tables (bin-pack handles partitioned)")
        val missing = zorderBy.filterNot(snap.schema.fieldNames.contains)
        require(missing.isEmpty, s"z-order columns not in table: $missing")
        snap.files
      } else if (materializing) snap.files
      else {
        // files written under a RETIRED partition spec are always
        // rewrite candidates — compaction is how an updateSpec'd table
        // migrates its history into the current layout (and regains
        // pruning on it)
        val fieldNames = fields.map(_.name).toSet
        snap.files.groupBy(_.partitionValues).values.flatMap { fs =>
          val oldSpec = fs.filter(_.partitionValues.keySet != fieldNames)
          val c = (fs.filter(_.size < targetFileBytes) ++ oldSpec).distinct
          if (c.size >= 2 || oldSpec.nonEmpty) c else Nil
        }.toSeq
      }
    if (rewritten.isEmpty) return (before, before)

    val sub = snap.copy(files = rewritten)
    val df = IcebergRead.readWithPositions(spark, sub).drop("__fp", "__ri")
      .select(snap.schema.fieldNames.map(col).toSeq: _*)
    val bytes = rewritten.map(_.size).sum
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val laid =
      if (zorderBy.nonEmpty) graft.ops.ZCluster.layout(df, zorderBy, parts)
      else if (fields.nonEmpty) df.repartition(parts,
        fields.map(f => IcebergTransforms.shadowColumn(f, df.schema)): _*)
      else df.repartition(parts)

    val snapshotId = nextSnapshotId(tableDir)
    val added = stageDataFiles(laid, Paths.get(tableDir), fields, snapshotId)
    IcebergFixture.commitSnapshot(tableDir, snap.schema, fields, snapshotId,
      added, rewritten.map(_.path).toSet,
      carryDeletes = !materializing, operation = "replace")
    (before, before - rewritten.size + added.size)
  }

  /** MERGE (upsert): WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT
    * * as a copy-on-write rewrite — [[DeltaWrite.merge]]'s counterpart,
    * same 3-job scale shape: (1) source key [min,max] bounds prune
    * candidate files through the manifest column bounds ([[StatsSkip]]),
    * (2) a distributed semi-join of the surviving files' rows (row-level
    * deletes pre-applied) against the distinct source keys finds the
    * exactly-touched files (driver holds O(touched) paths), (3) carried
    * rows are anti-joined out and unioned with every source row in one
    * distributed write, committed as `operation=overwrite` (Iceberg's
    * summary operation for row-replacing commits). Untouched files are
    * never rewritten; delete files are carried (they may still suppress
    * rows in untouched files; against the rewritten files they are
    * inert — the new files' sequence number is newer).
    *
    * Duplicate source keys reject loudly. Returns the committed snapshot
    * id (head unchanged on an empty source). */
  def merge(spark: org.apache.spark.sql.SparkSession, tableDir: String,
            source: DataFrame, keyCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    val snap = IcebergRead.snapshot(tableDir)
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val missing = keyCols.filterNot(snap.schema.fieldNames.contains)
    require(missing.isEmpty, s"merge keys not in table schema: $missing")
    val want = snap.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val got = source.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(got == want,
      s"merge source schema ${got.mkString(",")} != table ${want.mkString(",")}")
    val fieldCols = snap.schema.fieldNames.toSeq.map(col)

    // one-pass precheck (dup gate + row count + key bounds in a single
    // source job — MergeClauses.sourcePrecheck) feeding the stats prune
    val b = MergeClauses.sourcePrecheck(source, keyCols) match {
      case None => return snap.snapshotId // empty: no-op
      case Some(r) => r
    }
    val boundFilters = MergeClauses.keyBoundFilters(b, keyCols, snap.schema)
    val candidates = snap.files.filter(f =>
      StatsSkip.keep(f.stats, boundFilters, snap.schema))

    val srcKeys = source.select(keyCols.map(col): _*).distinct()
    val touched: Seq[IcebergRead.DataFile] =
      if (candidates.isEmpty) Nil
      else {
        val byQualified = candidates
          .map(f => IcebergRead.qualifiedPath(spark, f.path) -> f).toMap
        IcebergRead.readWithPositions(spark,
            snap.copy(files = candidates))
          .join(srcKeys, keyCols, "left_semi")
          .select(col("__fp")).distinct()
          .collect().map(_.getString(0)).toSeq
          .map(fp => byQualified.getOrElse(fp,
            throw new IllegalStateException(s"scan surfaced unknown file $fp")))
      }

    val src = source.select(fieldCols: _*)
    val out =
      if (touched.isEmpty) src
      else IcebergRead.readWithPositions(spark, snap.copy(files = touched))
        .drop("__fp", "__ri")
        .select(fieldCols: _*)
        .join(srcKeys, keyCols, "left_anti")
        .unionByName(src)

    val snapshotId = nextSnapshotId(tableDir)
    val added = stageDataFiles(out, Paths.get(tableDir),
      snap.partitionFields, snapshotId)
    IcebergFixture.commitSnapshot(tableDir, snap.schema,
      snap.partitionFields, snapshotId, added,
      touched.map(_.path).toSet, operation = "overwrite")
    snapshotId
  }

  /** MERGE with the FULL clause family ([[MergeClauses]]) —
    * [[DeltaWrite.mergeClauses]]'s Iceberg counterpart, same clause
    * semantics and scale shape (bounds-pruned + semi-joined touched
    * files, copy-on-write rewrite; a NOT-MATCHED-BY-SOURCE clause
    * touches every live file), committed as `operation=overwrite`.
    * Existing row-level delete files are pre-applied to the target rows
    * and carried (inert against the rewritten files — their sequence
    * number is newer). Returns the committed snapshot id (head
    * unchanged when nothing was touched or inserted). */
  def mergeClauses(spark: org.apache.spark.sql.SparkSession, tableDir: String,
                   source: DataFrame, keyCols: Seq[String],
                   clauses: Seq[MergeClauses.Clause],
                   aliases: (String, String) = ("t", "s")): Long = {
    import org.apache.spark.sql.functions._
    val snap = IcebergRead.snapshot(tableDir)
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val missing = keyCols.filterNot(snap.schema.fieldNames.contains)
    require(missing.isEmpty, s"merge keys not in table schema: $missing")
    val srcMissing = keyCols.filterNot(source.schema.fieldNames.contains)
    require(srcMissing.isEmpty, s"merge keys not in source: $srcMissing")
    val needsFullSchema = clauses.exists {
      case _: MergeClauses.NotMatchedInsert => true
      case MergeClauses.MatchedUpdate(set, _) => set.isEmpty
      case _ => false
    }
    if (needsFullSchema) {
      val want = snap.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val got = source.schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(got == want, "INSERT * / UPDATE SET * clauses need the full " +
        s"table schema in the source; got ${got.mkString(",")}, table has ${want.mkString(",")}")
    }
    val fieldCols = snap.schema.fieldNames.toSeq.map(col)

    // one-pass precheck: dup gate + row count + key bounds in one source
    // job (MergeClauses.sourcePrecheck); bounds only prune when no BY
    // SOURCE clause forces a full-table touch
    val pre = MergeClauses.sourcePrecheck(source, keyCols)

    val touched: Seq[IcebergRead.DataFile] =
      if (MergeClauses.touchesBySource(clauses)) snap.files
      else {
        val b = pre match {
          case None => return snap.snapshotId
          case Some(r) => r
        }
        val boundFilters = MergeClauses.keyBoundFilters(b, keyCols, snap.schema)
        val candidates = snap.files.filter(f =>
          StatsSkip.keep(f.stats, boundFilters, snap.schema))
        if (candidates.isEmpty) Nil
        else {
          val byQualified = candidates
            .map(f => IcebergRead.qualifiedPath(spark, f.path) -> f).toMap
          IcebergRead.readWithPositions(spark, snap.copy(files = candidates))
            .join(source.select(keyCols.map(col): _*).distinct(),
              keyCols, "left_semi")
            .select(col("__fp")).distinct()
            .collect().map(_.getString(0)).toSeq
            .map(fp => byQualified.getOrElse(fp,
              throw new IllegalStateException(s"scan surfaced unknown file $fp")))
        }
      }

    val target =
      if (touched.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      else IcebergRead.readWithPositions(spark, snap.copy(files = touched))
        .drop("__fp", "__ri").select(fieldCols: _*)
    val (out, _) = MergeClauses(target, source, keyCols, clauses, snap.schema, aliases)

    val snapshotId = nextSnapshotId(tableDir)
    val added = stageDataFiles(out, Paths.get(tableDir),
      snap.partitionFields, snapshotId)
    if (touched.isEmpty && added.isEmpty) return snap.snapshotId
    IcebergFixture.commitSnapshot(tableDir, snap.schema,
      snap.partitionFields, snapshotId, added,
      touched.map(_.path).toSet, operation = "overwrite")
    snapshotId
  }

  /** Merge-on-read DELETE via v2 POSITION-delete files: rows matching
    * `condition` are suppressed without rewriting any data file — the
    * next snapshot carries a content=1 delete manifest naming a
    * `file_path`/`pos` parquet, exactly the spec's copy-free delete.
    *
    * Scale shape, mirroring [[DeltaWrite.deleteWhere]]: matching
    * (file, position) pairs come from the DISTRIBUTED scan (physical
    * positions via `_metadata.row_index`, existing deletes pre-applied so
    * re-deletes accumulate instead of resurrect), and the delete parquet
    * is written by the cluster — the driver never materializes deleted
    * positions, only the file metadata for the commit.
    *
    * Returns the committed snapshot id (head unchanged when nothing
    * matched — an empty DELETE is a no-op, not an empty snapshot). */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, tableDir: String,
                  condition: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.col
    val snap = IcebergRead.snapshot(tableDir)
    // reverse map: qualified scan path → the manifest's absolute path
    // (delete files reference data files by their manifest path form)
    val toAbs: Map[String, String] =
      snap.files.map(f => IcebergRead.qualifiedPath(spark, f.path) -> f.path).toMap
    val absLk = {
      import spark.implicits._
      toAbs.toSeq.toDF("__q", "file_path")
    }
    val matches = IcebergRead.readWithPositions(spark, snap)
      .filter(condition)
      .join(org.apache.spark.sql.functions.broadcast(absLk),
        col("__fp") === col("__q"))
      .select(col("file_path"), col("__ri").as("pos"))
    val n = matches.count()
    if (n == 0L) return snap.snapshotId

    val snapshotId = nextSnapshotId(tableDir)
    val root = Paths.get(tableDir)
    val target = root.resolve(f"data/delete-$snapshotId%05d-pos.parquet")
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempDirectory("graft_ice_delw").toString
    // spec recommendation: sort position deletes by (file_path, pos) so
    // readers can merge-scan them
    matches.orderBy("file_path", "pos").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = listParquet(Paths.get(tmp)).head
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(Paths.get(tmp))

    IcebergFixture.commitSnapshot(tableDir, snap.schema,
      snap.partitionFields, snapshotId, Nil, Set.empty,
      Seq(IcebergFixture.DeleteSpec(target.toString, isEquality = false, Nil,
        n, Files.size(target))), operation = "delete")
    snapshotId
  }

  /** The next free snapshot id: max over the FULL retained lineage + 1,
    * NOT current + 1 — after a [[rollback]] the current snapshot is an
    * older one, and current+1 would collide with a rolled-over id,
    * corrupting the lineage with duplicate ids. */
  private def nextSnapshotId(tableDir: String): Long = {
    val metaDir = Paths.get(tableDir).resolve("metadata")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      Files.readString(metaDir.resolve(s"v$version.metadata.json")))
    meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong).max + 1
  }

  /** UPDATE the table's PARTITION SPEC — Iceberg's spec evolution
    * (`ALTER TABLE ... ADD/REPLACE PARTITION FIELD`): a metadata-only
    * commit appending a new spec (spec-id = max + 1) and repointing
    * `default-spec-id`. Existing data files keep their old spec's
    * layout and tuples (their manifests are CARRIED verbatim — reads
    * stay correct, old files simply stop pruning through the retired
    * identity channel); commits after this one lay files out under the
    * new spec, and a later [[rewriteDataFiles]] migrates old files
    * into it. `partCols` takes the same terms as [[write]]
    * (`days(ts)`, `bucket(8, key)`, bare names). Returns the new
    * metadata version. */
  def updateSpec(tableDir: String, partCols: Seq[String]): Int = {
    val snap = IcebergRead.snapshot(tableDir)
    val fields = partCols.map(IcebergTransforms.parseField)
    fields.foreach(f => require(snap.schema.fieldNames.contains(f.sourceCol),
      s"partition source column ${f.sourceCol} (${f.transform.specName}) " +
        s"not in $tableDir's schema"))
    val nameToId = snap.fieldIdToName.map(_.swap)
    val metaDir = Paths.get(tableDir).resolve("metadata")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      Files.readString(metaDir.resolve(s"v$version.metadata.json")))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val prevSpecs = Option(meta.get("partition-specs")).toSeq
      .flatMap(_.elements().asScala).toSeq
    val newId = prevSpecs.map(_.get("spec-id").asInt).maxOption
      .map(_ + 1).getOrElse(0)
    val arr = meta.putArray("partition-specs")
    prevSpecs.foreach(arr.add)
    val spec = arr.addObject()
    spec.put("spec-id", newId)
    val sf = spec.putArray("fields")
    fields.zipWithIndex.foreach { case (pf, i) =>
      val f = sf.addObject()
      f.put("name", pf.name); f.put("transform", pf.transform.specName)
      f.put("source-id", nameToId(pf.sourceCol))
      f.put("field-id", 1000 + i)
    }
    meta.put("default-spec-id", newId)
    IcebergFixture.commitMetadataVersion(metaDir, version + 1, meta)
    version + 1
  }

  /** RENAME a column — metadata-only, the spec's core evolution
    * strength: the field keeps its ID, so every existing data file
    * (whose parquet columns carry the OLD name but the same id) serves
    * the renamed column through field-id resolution with zero rewrite.
    * Appends after the rename use the new name; partition specs bind by
    * source-id and stay valid. Returns the new metadata version. */
  def renameColumn(tableDir: String, from: String, to: String): Int =
    evolveSchema(tableDir) { fields =>
      val names = fields.map(_.get("name").asText)
      require(names.contains(from), s"rename: column '$from' not in $tableDir")
      require(!names.contains(to), s"rename: column '$to' already exists in $tableDir")
      fields.foreach { f =>
        if (f.get("name").asText == from)
          f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .put("name", to)
      }
      fields
    }

  /** DROP a column — metadata-only: the field leaves the current
    * schema (its id is never reused — [[IcebergFixture.assignFieldIds]]
    * allocates past last-column-id), data files keep the bytes, and a
    * column RE-ADDED under the same name gets a fresh id, so old data
    * can never leak into it (field-id resolution serves NULLs). A
    * partition source column refuses to drop. Returns the new metadata
    * version. */
  def dropColumn(tableDir: String, name: String): Int =
    evolveSchema(tableDir, protectPartitionSources = Some(name)) { fields =>
      require(fields.exists(_.get("name").asText == name),
        s"drop: column '$name' not in $tableDir")
      require(fields.size > 1, s"drop: '$name' is the only column of $tableDir")
      fields.filterNot(_.get("name").asText == name)
    }

  /** Shared metadata-only schema evolution commit: append a NEW schema
    * version (old ones retained — their presence is also the reader's
    * switch to field-id resolution), repoint current-schema-id, CAS. */
  private def evolveSchema(tableDir: String,
                           protectPartitionSources: Option[String] = None)
      (transform: Seq[com.fasterxml.jackson.databind.JsonNode] =>
        Seq[com.fasterxml.jackson.databind.JsonNode]): Int = {
    val metaDir = Paths.get(tableDir).resolve("metadata")
    require(Files.exists(metaDir.resolve("version-hint.text")),
      s"$tableDir is not an Iceberg table")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      Files.readString(metaDir.resolve(s"v$version.metadata.json")))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val legacySingle = !meta.has("schemas")
    val currentId =
      if (legacySingle) 0 else meta.get("current-schema-id").asInt
    val currentSchema =
      if (legacySingle) meta.get("schema")
      else meta.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt == currentId)
        .getOrElse(throw new IllegalArgumentException(
          s"current-schema-id $currentId not in schemas of $tableDir"))
    val oldFields = currentSchema.get("fields").elements().asScala.toSeq

    protectPartitionSources.foreach { name =>
      val id = oldFields.find(_.get("name").asText == name)
        .map(_.get("id").asInt)
      val specSources = Option(meta.get("partition-specs")).toSeq
        .flatMap(_.elements().asScala)
        .flatMap(s => s.get("fields").elements().asScala)
        .map(_.get("source-id").asInt).toSet
      require(!id.exists(specSources.contains),
        s"drop: column '$name' is a partition source of $tableDir")
    }

    val newFields = transform(oldFields.map(_.deepCopy[
      com.fasterxml.jackson.databind.JsonNode]()))
    val maxSchemaId =
      if (legacySingle) 0
      else meta.get("schemas").elements().asScala
        .map(_.get("schema-id").asInt).max
    val newSchema = mapper.createObjectNode()
    newSchema.put("type", "struct")
    newSchema.put("schema-id", maxSchemaId + 1)
    val fa = newSchema.putArray("fields")
    newFields.foreach(fa.add)
    if (legacySingle) {
      val old = meta.get("schema")
        .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      old.put("schema-id", 0)
      val arr = meta.putArray("schemas")
      arr.add(old); arr.add(newSchema)
      meta.remove("schema")
    } else meta.get("schemas")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
      .add(newSchema)
    meta.put("current-schema-id", maxSchemaId + 1)
    IcebergFixture.commitMetadataVersion(metaDir, version + 1, meta)
    version + 1
  }

  /** ROLLBACK to a retained snapshot — Iceberg's `rollback_to_snapshot`
    * and [[DeltaWrite.restore]]'s counterpart, but METADATA-ONLY: the
    * spec resolves a table's state entirely through
    * `current-snapshot-id`, so rolling back is one CAS-fenced metadata
    * version that repoints it (no add/remove synthesis, no file IO —
    * this is the operational payoff of Iceberg keeping every snapshot
    * self-describing). The rolled-over snapshots stay in the lineage
    * (time-travelable, and re-rollback-able) until
    * [[expireSnapshots]] drops them. Fails loudly on an
    * expired/unknown id. Returns the new metadata version. */
  def rollback(tableDir: String, toSnapshotId: Long): Int = {
    val metaDir = Paths.get(tableDir).resolve("metadata")
    require(Files.exists(metaDir.resolve("version-hint.text")),
      s"$tableDir is not an Iceberg table")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      Files.readString(metaDir.resolve(s"v$version.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val ids = meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong).toSeq
    require(ids.contains(toSnapshotId),
      s"rollback target $toSnapshotId of $tableDir is not retained " +
        s"(have ${ids.mkString(",")})")
    if (meta.get("current-snapshot-id").asLong == toSnapshotId) return version
    val newMeta = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    newMeta.put("current-snapshot-id", toSnapshotId)
    IcebergFixture.commitMetadataVersion(metaDir, version + 1, newMeta)
    version + 1
  }

  /** Expire all but the newest `keepLast` snapshots — Iceberg's
    * `expireSnapshots` maintenance action (Table Spec: table metadata
    * `snapshots` may drop entries no longer reachable; files referenced
    * by NO retained snapshot may then be physically removed). The
    * [[DeltaWrite.vacuum]] counterpart for the other format: Delta
    * separates logical remove (tombstones) from physical reclaim;
    * Iceberg bundles both behind snapshot expiry, because time travel —
    * not a tombstone list — is what holds old files live.
    *
    * Mechanics: the newest `keepLast` snapshot entries (which always
    * include `current-snapshot-id` — snapshots are appended in commit
    * order) are carried into a new metadata version (CAS, same fence as
    * every commit); every manifest-list, manifest, data and delete file
    * reachable ONLY from the expired entries is deleted from disk.
    * Retained inventories count LIVE entries only (status 0/1): each
    * snapshot's manifests are self-describing — every file the snapshot
    * serves appears as a live entry in its own manifests — so a
    * status-2 (deleted) entry in a retained snapshot protects nothing
    * (older snapshots that still serve that file are either retained,
    * and list it live themselves, or expired, surrendering it).
    * Expired inventories count ALL statuses (deletion candidates are
    * conservative the other way). Driver cost is O(metadata), never
    * O(rows).
    *
    * Returns the number of files physically deleted. */
  def expireSnapshots(tableDir: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val metaDir = Paths.get(tableDir).resolve("metadata")
    require(Files.exists(metaDir.resolve("version-hint.text")),
      s"$tableDir is not an Iceberg table")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      Files.readString(metaDir.resolve(s"v$version.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snaps = meta.get("snapshots").elements().asScala.toSeq
    if (snaps.size <= keepLast) return 0
    val (expired0, kept0) = snaps.splitAt(snaps.size - keepLast)
    val currentId = meta.get("current-snapshot-id").asLong
    // after a rollback the current snapshot may sit OUTSIDE the newest-N
    // suffix; it is always retained (expiring the state a reader resolves
    // through would be nonsense), in its original lineage position
    val (currentKeep, expired) =
      if (kept0.exists(_.get("snapshot-id").asLong == currentId))
        (Nil, expired0)
      else expired0.partition(_.get("snapshot-id").asLong == currentId)
    val kept = currentKeep ++ kept0

    // file inventory of one snapshot: its manifest list, every manifest,
    // and the data/delete files its entries reference. For RETAINED
    // snapshots only LIVE entries (status 0 existing / 1 added) hold a
    // file — a status-2 (DELETED) entry is removal bookkeeping, and with
    // suffix retention the file's content is only served by snapshots
    // that are all older, hence all expired. For EXPIRED snapshots every
    // referenced path is a deletion candidate (the retained set is what
    // protects survivors).
    def inventory(sn: com.fasterxml.jackson.databind.JsonNode,
                  liveOnly: Boolean): Set[Path] = {
      val out = scala.collection.mutable.Set[Path]()
      val ml = IcebergRead.resolve(tableDir, sn.get("manifest-list").asText)
      out += ml
      IcebergRead.avroRows(ml).foreach { m =>
        val mPath = IcebergRead.resolve(tableDir, m.get("manifest_path").toString)
        out += mPath
        IcebergRead.avroRows(mPath).foreach { e =>
          val status = Option(e.get("status"))
            .map(_.asInstanceOf[Number].intValue).getOrElse(0)
          if (!liveOnly || status != 2) {
            val df = e.get("data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            out += IcebergRead.resolve(tableDir, df.get("file_path").toString)
          }
        }
      }
      out.toSet
    }
    val retained = kept.flatMap(inventory(_, liveOnly = true)).toSet
    val toDelete = expired.flatMap(inventory(_, liveOnly = false)).toSet -- retained

    // commit the truncated snapshot list FIRST (readers of the new
    // version never reference the doomed files), then reclaim
    val newMeta = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val arr = newMeta.putArray("snapshots")
    kept.foreach(arr.add)
    IcebergFixture.commitMetadataVersion(metaDir, version + 1, newMeta)
    toDelete.count(Files.deleteIfExists(_))
  }

  private[sources] def rowCount(conf: org.apache.hadoop.conf.Configuration,
                                file: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val rdr = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.toUri), conf))
    try rdr.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally rdr.close()
  }

  private def listParquet(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    finally s.close()
  }

  private def deleteRecursively(dir: Path): Unit = {
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
