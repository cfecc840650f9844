package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Read-path interop for Apache Iceberg tables — open-spec metadata
  * parsing, no Iceberg library and no write path. Everything derives from
  * the published Iceberg Table Spec (iceberg.apache.org/spec):
  *
  *   metadata/v<N>.metadata.json   table metadata (schema, partition
  *                                 specs, snapshot log); newest N wins,
  *                                 version-hint.text short-circuits
  *   snapshot.manifest-list        avro, one row per manifest file
  *   manifest file                 avro `manifest_entry` rows: status
  *                                 (1 added / 0 existing / 2 deleted) +
  *                                 `data_file` struct (path, format,
  *                                 partition tuple, counts)
  *
  * State reconstruction is simpler than Delta's log replay: the CURRENT
  * snapshot's manifest list IS the live state — per-snapshot manifests
  * already encode liveness in `status` (deleted entries exist only so
  * incremental consumers can see removals). Live files = entries with
  * status ≠ 2 across the snapshot's data manifests.
  *
  * Iceberg differs from Delta in one load-bearing way: data files CONTAIN
  * the partition source columns (partitioning is a derived transform, not
  * a physical layout contract). So the scan relation exposes NO Spark
  * partition columns; instead [[IcebergFileIndex]] prunes file groups on
  * the ordinary pushed dataFilters whose references are identity-partition
  * source columns — same arithmetic as the Delta index, different filter
  * channel, both through [[PartitionPrune]].
  *
  * Scope (declared): reads the current snapshot; format v1/v2; parquet
  * data files; identity partition transforms (bucket/truncate/date
  * transforms prune nothing — correct, just unpruned — since transformed
  * values can't be compared to source-column literals without the
  * transform itself); delete manifests / delete data files (v2 row-level
  * deletes) and non-primitive schema fields are rejected loudly rather
  * than read wrongly. */
object IcebergRead {

  final case class DataFile(path: String, partitionValues: Map[String, String],
                            size: Long, recordCount: Long)

  final case class Snapshot(snapshotId: Long, schema: StructType,
                            identityPartitionCols: Seq[String],
                            files: Seq[DataFile]) {
    def partitionTupleSchema: StructType =
      StructType(identityPartitionCols.map(c => schema.fields(schema.fieldIndex(c))))
  }

  private val mapper = new ObjectMapper()

  /** Parse the newest table metadata and resolve the current snapshot. */
  def snapshot(tableDir: String): Snapshot = {
    val metaDir = Paths.get(tableDir, "metadata")
    require(Files.isDirectory(metaDir), s"$tableDir has no metadata/ — not an Iceberg table")
    val meta = mapper.readTree(Files.readString(currentMetadataFile(metaDir)))
    val fv = meta.get("format-version").asInt
    require(fv == 1 || fv == 2, s"unsupported Iceberg format-version $fv")

    val schemaNode =
      if (meta.has("schemas")) {
        val id = meta.get("current-schema-id").asInt
        meta.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt == id)
          .getOrElse(throw new IllegalArgumentException(s"current-schema-id $id not in schemas"))
      } else meta.get("schema")
    val (schema, idToName) = parseSchema(schemaNode)

    val specNode =
      if (meta.has("partition-specs")) {
        val id = meta.get("default-spec-id").asInt
        meta.get("partition-specs").elements().asScala
          .find(_.get("spec-id").asInt == id)
          .getOrElse(throw new IllegalArgumentException(s"default-spec-id $id not in partition-specs"))
          .get("fields")
      } else meta.get("partition-spec")
    // identity transforms prune; anything else is read unpruned — but a
    // VOID/unknown transform is fine, the partition tuple is metadata only
    val identityCols = Option(specNode).toSeq.flatMap(_.elements().asScala).collect {
      case f if f.get("transform").asText == "identity" =>
        idToName.getOrElse(f.get("source-id").asInt,
          throw new IllegalArgumentException(
            s"partition source-id ${f.get("source-id").asInt} not in schema"))
    }

    val curId = Option(meta.get("current-snapshot-id")).map(_.asLong)
      .filter(_ != -1L)
      .getOrElse(throw new IllegalArgumentException(s"$tableDir has no current snapshot"))
    val snapNode = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curId)
      .getOrElse(throw new IllegalArgumentException(s"current-snapshot-id $curId not in snapshots"))
    val manifestList = resolve(tableDir, snapNode.get("manifest-list").asText)

    val files = readManifestList(tableDir, manifestList, identityCols)
    Snapshot(curId, schema, identityCols, files)
  }

  /** Scan the current snapshot, dead files excluded, identity-partition
    * predicates pruned at the FileIndex. */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val snap = snapshot(tableDir)
    val idx = new IcebergFileIndex(spark, snap)
    // data files CONTAIN partition columns → no Spark-side partition schema
    val rel = HadoopFsRelation(idx, new StructType(), snap.schema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(rel)
  }

  /** Files a scan filtered to `col -> allowed values` must touch — the
    * pruning arithmetic of [[IcebergFileIndex.listFiles]], pinnable by an
    * oracle row without executing a plan. */
  def candidateFiles(snap: Snapshot, keep: Map[String, Set[String]]): Seq[DataFile] =
    snap.files.filter(f => keep.forall { case (c, vs) =>
      f.partitionValues.get(c).exists(vs.contains)
    })

  // ---- metadata internals --------------------------------------------

  private def currentMetadataFile(metaDir: Path): Path = {
    val hint = metaDir.resolve("version-hint.text")
    if (Files.exists(hint)) {
      val v = Files.readString(hint).trim.toInt
      val p = metaDir.resolve(s"v$v.metadata.json")
      require(Files.exists(p), s"version-hint names $p but it is missing")
      p
    } else {
      val listing = Files.list(metaDir)
      try listing.iterator().asScala
        .filter(_.getFileName.toString.matches("v\\d+\\.metadata\\.json"))
        .maxByOption(_.getFileName.toString.stripPrefix("v")
          .stripSuffix(".metadata.json").toInt)
        .getOrElse(throw new IllegalArgumentException(s"no v*.metadata.json in $metaDir"))
      finally listing.close()
    }
  }

  /** Iceberg schema JSON → Spark StructType + field-id→name map. */
  private def parseSchema(node: JsonNode): (StructType, Map[Int, String]) = {
    require(node.get("type").asText == "struct", "top-level schema must be a struct")
    val ids = scala.collection.mutable.Map[Int, String]()
    val fields = node.get("fields").elements().asScala.map { f =>
      val name = f.get("name").asText
      ids(f.get("id").asInt) = name
      StructField(name, primitiveType(f.get("type"), name),
        nullable = !f.get("required").asBoolean)
    }.toSeq
    (StructType(fields), ids.toMap)
  }

  private def primitiveType(t: JsonNode, at: String): DataType = {
    require(t.isTextual,
      s"field '$at': nested Iceberg types (struct/list/map) are not supported")
    t.asText match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "string" => StringType
      case "binary" => BinaryType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case dec if dec.startsWith("decimal(") =>
        val Array(p, s) = dec.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
        DecimalType(p, s)
      case other =>
        throw new IllegalArgumentException(s"field '$at': unsupported Iceberg type '$other'")
    }
  }

  private def readManifestList(tableDir: String, manifestList: Path,
                               identityCols: Seq[String]): Seq[DataFile] = {
    val live = scala.collection.mutable.ArrayBuffer[DataFile]()
    avroRows(manifestList).foreach { m =>
      val content = intField(m, "content").getOrElse(0)
      require(content == 0,
        s"delete manifests (content=$content) are not supported — " +
          "row-level deletes would be silently ignored")
      val mPath = resolve(tableDir, m.get("manifest_path").toString)
      avroRows(mPath).foreach { e =>
        val status = intField(e, "status").getOrElse(0)
        if (status != 2) {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fContent = intField(df, "content").getOrElse(0)
          require(fContent == 0,
            s"delete files (data_file.content=$fContent) are not supported")
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("parquet"), s"unsupported file_format $fmt")
          val pv = Option(df.get("partition")) match {
            case Some(rec: GenericRecord) =>
              rec.getSchema.getFields.asScala.map { f =>
                f.name -> Option(rec.get(f.name)).map(_.toString).orNull
              }.toMap
            case _ => Map.empty[String, String]
          }
          live += DataFile(resolve(tableDir, df.get("file_path").toString).toString,
            pv, longField(df, "file_size_in_bytes").getOrElse(0L),
            longField(df, "record_count").getOrElse(0L))
        }
      }
    }
    live.toSeq
  }

  private def avroRows(p: Path): Seq[GenericRecord] = {
    val reader = DataFileReader.openReader(p.toFile, new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toSeq finally reader.close()
  }

  private def intField(r: GenericRecord, name: String): Option[Int] =
    Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name)))
      .map(_.asInstanceOf[Number].intValue)
  private def longField(r: GenericRecord, name: String): Option[Long] =
    Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name)))
      .map(_.asInstanceOf[Number].longValue)

  /** Spec paths are full URIs; tolerate relative paths from lax writers. */
  private def resolve(tableDir: String, raw: String): Path = {
    val uri = try new java.net.URI(raw) catch { case _: java.net.URISyntaxException => null }
    if (uri != null && uri.getScheme != null) Paths.get(uri)
    else if (raw.startsWith("/")) Paths.get(raw)
    else Paths.get(tableDir).resolve(raw)
  }
}

/** FileIndex over an Iceberg snapshot. No Spark partition columns (they
  * live in the data files); pruning happens on pushed DATA filters whose
  * references are identity-partition source columns — sound because every
  * row in a file carries exactly the file's partition tuple for those
  * columns. */
final class IcebergFileIndex(spark: SparkSession, snap: IcebergRead.Snapshot)
    extends FileIndex {

  private val tupleSchema = snap.partitionTupleSchema

  private lazy val groups: Seq[(InternalRow, Seq[IcebergRead.DataFile])] =
    snap.files.groupBy(f => tupleSchema.fieldNames.toSeq.map(f.partitionValues.get))
      .values.toSeq.map(fs => (PartitionPrune.partRow(tupleSchema,
        fs.head.partitionValues, spark.sessionState.conf.sessionLocalTimeZone), fs))

  private def statusOf(f: IcebergRead.DataFile) = {
    val hPath = new org.apache.hadoop.fs.Path(Paths.get(f.path).toUri)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    FileStatusWithMetadata(fs.getFileStatus(hPath))
  }

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
    snap.files.headOption.toSeq.map(f =>
      new org.apache.hadoop.fs.Path(Paths.get(f.path).getParent.toUri))
  override def partitionSchema: StructType = new StructType()
  override def sizeInBytes: Long = snap.files.map(_.size).sum
  override def inputFiles: Array[String] = snap.files.map(_.path).toArray
  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    // empty partition schema ⇒ pruning predicates arrive as dataFilters;
    // PartitionPrune keeps only conjuncts over the identity tuple columns
    PartitionPrune.prune(tupleSchema, groups, dataFilters)
      .map { case (_, fs) => PartitionDirectory(InternalRow.empty, fs.map(statusOf)) }
}
