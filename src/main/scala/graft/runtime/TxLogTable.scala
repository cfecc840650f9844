package graft.runtime

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** A minimal log-structured transactional table format over a Parquet
  * directory — the Spark-native answer to the reference's reliance on a
  * transactional warehouse (Databricks `MERGE INTO` / `ALTER TABLE` in
  * `macros/rehashing/single_entities/databricks/rehash_single_hub.sql:84-111,17-26`)
  * without requiring Delta/Iceberg jars.
  *
  * Layout:
  * {{{
  *   <base>/<name>/_log/v00000001.manifest   # header: column mapping
  *                                           # body: one line per live file
  *   <base>/<name>/d-<uuid>/part-*.parquet   # immutable data-file batches
  * }}}
  *
  * Properties, each asserted by `TxLogTableSpec`:
  *  - **Atomic commits**: a manifest is staged as `.tmp-*` and published via
  *    a hard-link CAS (`Files.createLink` fails if the version already
  *    exists). A crash mid-commit leaves only ignorable tmp files — never a
  *    half-visible table state.
  *  - **Snapshot isolation**: readers resolve a manifest once; data files
  *    are immutable and never deleted by commits, so a DataFrame read before
  *    a concurrent overwrite/merge keeps returning its version's rows.
  *  - **Optimistic concurrency**: two writers racing to commit the same
  *    version — one wins, the loser sees the CAS fail, re-reads the new
  *    state and retries (append) or aborts (overwrite of a stale snapshot).
  *  - **Time travel**: any retained version can be read back by number.
  *  - **Metadata-only DDL**: add/rename/drop column commit a new manifest
  *    and touch ZERO data files — logical names map to immutable physical
  *    names (Delta's column mapping), files predating an added column
  *    null-fill through the typed mapping.
  *  - **Vacuum**: unreferenced files are deleted only when older than the
  *    retained version horizon, so in-flight readers stay valid.
  *
  * File-level MERGE (`replaceFiles`) is the primitive Delta's MERGE compiles
  * to: rewrite the touched files, commit (removed, added) in one version.
  */
final class TxLogTable(val spark: SparkSession, val baseDir: String) extends VaultStore {

  // ---- VaultStore: the Runner schedules transactional vaults too --------
  def readIfExists(name: String): Option[DataFrame] =
    currentVersion(name).map(readVersion(name, _))
  /** non-CAS overwrite (VaultStore form): last writer wins, like
    * [[TableStore.overwrite]]; pass `expectedVersion` for the guarded
    * read-modify-overwrite contract */
  def overwrite(name: String, df: DataFrame): Unit = overwrite(name, df, None)

  import TxLogTable.{ColMap, EqDelete}

  def root(name: String): Path = Paths.get(baseDir, name)
  private def logDir(name: String): Path = root(name).resolve("_log")

  // tables / registerViews inherit from VaultStore; here exists() demands a
  // committed _log, and each registered view is the table's CURRENT snapshot
  // resolved at registration time (snapshot isolation: re-register to
  // advance past later commits).

  private val ManifestRe = raw"v(\d{8})\.manifest".r
  private val ColHeader = "#col\t"
  private val StatsColHeader = "#statscol\t"
  private val FStatHeader = "#fstat\t"
  private val TxnHeader = "#txn\t"
  private val EDelHeader = "#edel\t"
  private val CheckHeader = "#check\t"

  /** committed versions, ascending (tmp/garbage ignored) */
  def versions(name: String): Seq[Long] = {
    val d = logDir(name)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.flatMap(_.getFileName.toString match {
        case ManifestRe(n) => Some(n.toLong)
        case _             => None
      }).toSeq.sorted
      finally s.close()
    }
  }

  def currentVersion(name: String): Option[Long] = versions(name).lastOption

  def exists(name: String): Boolean = currentVersion(name).isDefined

  private def manifestPath(name: String, v: Long): Path =
    logDir(name).resolve(f"v$v%08d.manifest")

  /** A committed manifest is immutable (writers only ever tryCommit a NEW
    * version), so (name, v) → lines is a pure function — memoize it. A
    * single metadata op reads the manifest several times (metaOf parses 8
    * sections) and a point-probe workload calls metadata ops per key;
    * uncached, 40 bloom probes re-read a multi-MB manifest ~400 times
    * (round-6 bench: >7 s of the bloom query was manifest re-parsing).
    * Bounded: manifests of old versions fall out once the cache grows. */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Seq[String]]()

  private def manifestLines(name: String, v: Long): Seq[String] = {
    // Eviction happens OUTSIDE the computeIfAbsent lambda: the CHM
    // contract forbids the mapping function from mutating the map, and a
    // clear() inside it can livelock/corrupt under concurrent metadata
    // ops (exercised by concurrent appends, TxLogTableSpec).
    if (manifestCache.size > 64) manifestCache.clear()
    manifestCache.computeIfAbsent((name, v), { _ =>
      Files.readAllLines(manifestPath(name, v)).asScala.toSeq.filter(_.nonEmpty)
    })
  }

  /** live data files of a version, relative to the table root */
  def files(name: String, v: Long): Seq[String] =
    manifestLines(name, v).filterNot(_.startsWith("#"))

  /** the version's logical→physical column mapping (empty: unmapped legacy
    * manifest — raw parquet schema applies) */
  def mapping(name: String, v: Long): Seq[ColMap] =
    manifestLines(name, v).filter(_.startsWith(ColHeader)).map { l =>
      // tab-separated: physical \t logical \t catalogString (type strings
      // contain ':' and ',', so '\t' is the only safe delimiter)
      val parts = l.stripPrefix(ColHeader).split('\t')
      ColMap(parts(0), parts(1), parts(2))
    }

  /** physical columns with per-file min/max stats collection enabled */
  def statsColumns(name: String, v: Long): Seq[String] =
    manifestLines(name, v).filter(_.startsWith(StatsColHeader))
      .map(_.stripPrefix(StatsColHeader))

  /** per-file min/max stats: (file, physicalCol) → (min, max), both rendered
    * through CAST AS STRING. Files/columns without an entry are simply
    * unprunable — the safe default. */
  def fileStats(name: String, v: Long): Map[(String, String), (String, String)] =
    manifestLines(name, v).filter(_.startsWith(FStatHeader)).map { l =>
      val p = l.stripPrefix(FStatHeader).split('\t')
      (p(0), p(1)) -> (p(2), p(3))
    }.toMap

  /** the version's EQUALITY DELETE files (merge-on-read row-level deletes,
    * Iceberg's equality-delete / Delta's deletion-vector idea): each holds
    * the deleted KEYS (physical column names — immutable under renames)
    * and is SCOPED to the data files live when the delete committed, so a
    * later append that re-inserts a deleted key is visible. A delete
    * commits one key file + one manifest line and rewrites ZERO data
    * files — at 100 TB that turns "purge these ids" from a table rewrite
    * into O(keys) + metadata. */
  def equalityDeletes(name: String, v: Long): Seq[EqDelete] =
    manifestLines(name, v).filter(_.startsWith(EDelHeader)).map { l =>
      val p = l.stripPrefix(EDelHeader).split('\t')
      EqDelete(p(0), p(1).split(',').toSeq, p(2).split(',').toSet)
    }

  /** the version's CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT`
    * semantics): name → SQL predicate over LOGICAL column names, enforced
    * on every row-adding write. */
  def checkConstraints(name: String, v: Long): Map[String, String] =
    manifestLines(name, v).filter(_.startsWith(CheckHeader)).map { l =>
      val p = l.stripPrefix(CheckHeader).split('\t')
      p(0) -> p(1)
    }.toMap

  /** committed (appId → latest batchVersion) transaction markers — the
    * exactly-once bookkeeping streaming sinks read (cf. Delta's
    * txnAppId/txnVersion) */
  def txnVersions(name: String, v: Long): Map[String, Long] =
    manifestLines(name, v).filter(_.startsWith(TxnHeader)).map { l =>
      val p = l.stripPrefix(TxnHeader).split('\t')
      p(0) -> p(1).toLong
    }.toMap

  /** the latest committed batchVersion for `appId`, if any */
  def txnVersion(name: String, appId: String): Option[Long] =
    currentVersion(name).flatMap(v => txnVersions(name, v).get(appId))

  private def render(cols: Seq[ColMap], fs: Seq[String],
                     statsCols: Seq[String] = Nil,
                     stats: Map[(String, String), (String, String)] = Map.empty,
                     txns: Map[String, Long] = Map.empty,
                     edels: Seq[EqDelete] = Nil): Seq[String] =
    cols.map(c => s"$ColHeader${c.physical}\t${c.logical}\t${c.typeDdl}") ++
      statsCols.map(c => s"$StatsColHeader$c") ++
      stats.toSeq.sortBy(_._1).map { case ((f, c), (mn, mx)) =>
        s"$FStatHeader$f\t$c\t$mn\t$mx"
      } ++
      txns.toSeq.sorted.map { case (a, bv) => s"$TxnHeader$a\t$bv" } ++
      edels.map(e =>
        s"$EDelHeader${e.file}\t${e.keyPhys.mkString(",")}\t${e.scope.toSeq.sorted.mkString(",")}") ++
      fs

  /** Publish `lines` as version `v` of `name`. Returns false when `v` was
    * committed concurrently by another writer (CAS lost — re-read, retry). */
  private def tryCommit(name: String, v: Long, lines: Seq[String]): Boolean = {
    Files.createDirectories(logDir(name))
    val tmp = logDir(name).resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    val target = manifestPath(name, v)
    try { Files.createLink(target, tmp); Files.delete(tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.delete(tmp); false
      case _: UnsupportedOperationException =>
        // filesystem without hard links: fall back to create-new move (still
        // atomic-rename on POSIX; the exists-check narrows the race window)
        if (Files.exists(target)) { Files.delete(tmp); false }
        else {
          try { Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE); true }
          catch { case _: java.nio.file.FileAlreadyExistsException =>
            Files.delete(tmp); false }
        }
    }
  }

  /** identity mapping for a table born from `df`'s schema */
  private def identityMapping(df: DataFrame): Seq[ColMap] =
    df.schema.fields.toIndexedSeq.map(f =>
      ColMap(f.name, f.name, f.dataType.catalogString))

  /** the full metadata of one version */
  private case class Meta(cols: Seq[ColMap], statsCols: Seq[String],
                          stats: Map[(String, String), (String, String)],
                          txns: Map[String, Long] = Map.empty,
                          edels: Seq[EqDelete] = Nil,
                          bloomCols: Map[String, Int] = Map.empty,
                          blooms: Map[(String, String), String] = Map.empty,
                          checks: Map[String, String] = Map.empty)

  private def metaOf(name: String, v: Long): Meta =
    Meta(mapping(name, v), statsColumns(name, v), fileStats(name, v),
      txnVersions(name, v), equalityDeletes(name, v),
      bloomColumns(name, v), fileBlooms(name, v), checkConstraints(name, v))

  /** enforce the version's CHECK constraints on rows about to be written:
    * a row violates when the predicate is FALSE **or NULL** (Delta's
    * constraint semantics — an unknown is not proof of validity). Throws
    * with the per-constraint violation counts; costs one pass over the
    * BATCH, never the table. */
  private def requireChecks(m: Meta, df: DataFrame, what: String): Unit = {
    if (m.checks.isEmpty) return
    import org.apache.spark.sql.functions.{coalesce => fcoalesce, count => fcount, expr, lit => flit, sum => fsum, when => fwhen}
    val aggs = m.checks.toSeq.sortBy(_._1).map { case (n, sql) =>
      fsum(fwhen(!fcoalesce(expr(sql), flit(false)), 1L).otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = m.checks.keys.toSeq.sorted.zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"CHECK constraint violation on $what: " +
          bad.map { case (n, c) => s"$n (${m.checks(n)}): $c rows" }.mkString("; "))
  }

  /** ALTER TABLE ADD CONSTRAINT: validates the EXISTING rows first (a
    * constraint the current data violates is refused with the count),
    * then commits the manifest line; all later row-adding writes enforce
    * it. */
  def addCheckConstraint(name: String, constraintName: String, sql: String): Unit = {
    require(!constraintName.exists(c => c == '\t' || c == '\n') &&
      !sql.exists(c => c == '\t' || c == '\n'),
      "constraint name/expression must be free of tabs and line breaks")
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    requireChecks(m.copy(checks = Map(constraintName -> sql)),
      readWithDeletes(name, m.cols, files(name, v), m.edels),
      s"$name: existing rows reject new constraint")
    val m2 = m.copy(checks = m.checks + (constraintName -> sql))
    if (!tryCommit(name, v + 1, renderM(m2, files(name, v))))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on addCheckConstraint — retry")
  }

  def dropCheckConstraint(name: String, constraintName: String): Unit = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    if (!tryCommit(name, v + 1,
        renderM(m.copy(checks = m.checks - constraintName), files(name, v))))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on dropCheckConstraint — retry")
  }

  private def renderM(m: Meta, fs: Seq[String]): Seq[String] = {
    val liveSet = fs.toSet
    // delete files scope-narrow to the surviving data files; a delete
    // whose entire scope was rewritten/removed carries nothing and drops
    val live = m.edels
      .map(e => e.copy(scope = e.scope.intersect(liveSet)))
      .filter(_.scope.nonEmpty)
    render(m.cols, fs, m.statsCols,
      m.stats.filter { case ((f, _), _) => liveSet(f) }, m.txns, live) ++
      m.bloomCols.toSeq.sorted.map { case (pc, n) => s"$BloomColHeader$pc\t$n" } ++
      m.blooms.toSeq.sortBy(_._1).collect {
        case ((f, pc), b64) if liveSet(f) => s"$FBloomHeader$f\t$pc\t$b64"
      } ++
      m.checks.toSeq.sorted.map { case (n, sql) => s"$CheckHeader$n\t$sql" }
  }

  /** Per-file min/max of the stats columns for a just-written batch, read
    * from the parquet FOOTERS — driver-side metadata work (one footer per
    * file, O(files) not O(rows)) replacing the full read-back Spark job
    * this used to cost on every stats-bearing commit. Values render
    * exactly as the scan path rendered them (Spark CAST AS STRING under
    * the session time zone), so stored stats stay comparable with
    * caller-supplied probe bounds and across commit eras. Footer min/max
    * remain valid BOUNDS even when the writer truncated long strings (min
    * rounds down, max rounds up per the parquet spec), so interval pruning
    * stays sound; a column that is all-NULL in a file, or absent from it,
    * gets no entry (unprunable, safe) — same as before. A file whose
    * footer is unusable for any requested column with actual values
    * (INT96 timestamps, exotic types, a writer that dropped stats) falls
    * back to the old one-pass scan for that file: identical results at
    * the old cost. */
  private def batchStats(name: String, batchFiles: Seq[String],
                         statsCols: Seq[String]): Map[(String, String), (String, String)] = {
    if (statsCols.isEmpty || batchFiles.isEmpty) return Map.empty
    val conf = spark.sparkContext.hadoopConfiguration
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    val out = Map.newBuilder[(String, String), (String, String)]
    val fallback = Seq.newBuilder[String]
    batchFiles.foreach { f =>
      footerMinMax(conf, root(name).resolve(f), statsCols, zone) match {
        case Some(entries) =>
          entries.foreach { case (c, mnmx) => out += ((f, c) -> mnmx) }
        case None => fallback += f
      }
    }
    val needScan = fallback.result()
    // fallback telemetry (VERDICT r14): a silent 100%-fallback table pays
    // footer-open cost PLUS the old scan — make the rate visible
    if (needScan.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"TxLogTable $name batchStats: footer fallback for " +
          s"${needScan.size}/${batchFiles.size} files (INT96/statless)")
    val scanned = if (needScan.isEmpty) Map.empty else scanStats(name, needScan, statsCols)
    out.result() ++ scanned
  }

  /** The pre-footer stats pass: one column-pruned Spark scan over `fs`
    * collecting per-file min/max. Kept as the fallback for files whose
    * footer stats are unusable. */
  private def scanStats(name: String, batchFiles: Seq[String],
                        statsCols: Seq[String]): Map[(String, String), (String, String)] = {
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val df = spark.read.option("mergeSchema", "true")
      .parquet(batchFiles.map(f => root(name).resolve(f).toString): _*)
    val present = df.columns.toSet
    val cols = statsCols.filter(present)
    if (cols.isEmpty) return Map.empty
    val aggs = cols.flatMap(c => Seq(
      fmin(col(c)).cast("string").as(s"__mn_$c"),
      fmax(col(c)).cast("string").as(s"__mx_$c")))
    df.groupBy(input_file_name().as("__f")).agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.flatMap { r =>
        val abs = r.getAs[String]("__f")
        batchFiles.find(f => abs.endsWith("/" + f)).toSeq.flatMap { rel =>
          cols.flatMap { c =>
            (Option(r.getAs[String](s"__mn_$c")), Option(r.getAs[String](s"__mx_$c"))) match {
              case (Some(mn), Some(mx)) => Some((rel, c) -> (mn, mx))
              case _                    => None // all-NULL file: unprunable, safe
            }
          }
        }
      }.toMap
  }

  /** Footer min/max of `statsCols` for one file, rendered as Spark CAST AS
    * STRING. Some(entries): usable (absent / all-NULL columns yield no
    * entry). None: at least one requested column has values but unusable
    * stats — caller must scan this file. */
  private def footerMinMax(conf: org.apache.hadoop.conf.Configuration,
                           file: java.nio.file.Path, statsCols: Seq[String],
                           zone: java.time.ZoneId): Option[Seq[(String, (String, String))]] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val hPath = new org.apache.hadoop.fs.Path(file.toUri)
    val rdr = try ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    catch { case _: Exception => return None }
    try {
      val blocks = rdr.getFooter.getBlocks.asScala.toSeq
      val schema = rdr.getFooter.getFileMetaData.getSchema
      val entries = Seq.newBuilder[(String, (String, String))]
      statsCols.foreach { c =>
        // only TOP-LEVEL primitive columns are ever stats columns (the
        // writer casts to the mapping's flat physical schema)
        val inSchema = schema.getFields.asScala.exists(_.getName == c)
        if (inSchema) {
          val prim = schema.getType(Seq(c): _*).asPrimitiveType()
          var lo: Any = null; var hi: Any = null
          var usable = true; var hasValues = false
          blocks.foreach { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == c) match {
              case None => usable = false
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty) {
                  // no stats at all: if the block has rows, values may exist
                  if (b.getRowCount > 0) { usable = false; hasValues = true }
                } else if (st.hasNonNullValue) {
                  hasValues = true
                  val (mn, mx) = (st.genericGetMin, st.genericGetMax)
                  if (lo == null || cmpFooter(prim, mn, lo) < 0) lo = mn
                  if (hi == null || cmpFooter(prim, mx, hi) > 0) hi = mx
                } else if (!st.isNumNullsSet || st.getNumNulls < b.getRowCount) {
                  usable = false; hasValues = true // values but no bounds
                } // else: all-NULL block — contributes nothing, stays usable
            }
          }
          if (!usable && hasValues) return None // scan fallback
          if (usable && lo != null) {
            (renderFooterValue(lo, prim, zone), renderFooterValue(hi, prim, zone)) match {
              case (Some(mn), Some(mx)) => entries += (c -> (mn, mx))
              case _ => return None // unrenderable type (INT96, …) — scan
            }
          }
          // lo == null (all-NULL or zero rows): no entry — unprunable, safe
        }
        // column not in this file (pre-DDL era): no entry, same as before
      }
      Some(entries.result())
    } catch { case _: Exception => None }
    finally rdr.close()
  }

  /** footer values are Comparable within a column's physical type — except
    * Binary, whose order depends on the LOGICAL type: strings combine in
    * UNSIGNED byte order (the order Spark's string min/max uses), while a
    * DECIMAL stored as BINARY/FIXED_LEN_BYTE_ARRAY is a SIGNED big-endian
    * two's-complement integer — combining those unsigned would let a
    * multi-rowgroup file with mixed-sign decimals store min > true min
    * (e.g. block mins [-5, 3] combine to 3) and silently wrong-prune. */
  private def cmpFooter(prim: org.apache.parquet.schema.PrimitiveType,
                        a: Any, b: Any): Int = (a, b) match {
    case (x: org.apache.parquet.io.api.Binary, y: org.apache.parquet.io.api.Binary) =>
      prim.getLogicalTypeAnnotation match {
        case _: org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          new java.math.BigInteger(x.getBytes)
            .compareTo(new java.math.BigInteger(y.getBytes))
        case _ =>
          org.apache.spark.unsafe.types.UTF8String.fromBytes(x.getBytes)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromBytes(y.getBytes))
      }
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /** One footer value rendered the way Spark CAST AS STRING renders the
    * corresponding Catalyst value — the format every stats consumer
    * (statCompare probes, TxRehash's activeStr checks) compares against.
    * None = type we cannot render faithfully; caller falls back to the
    * scan. */
  private def renderFooterValue(v: Any, prim: org.apache.parquet.schema.PrimitiveType,
                                zone: java.time.ZoneId): Option[String] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val ann = prim.getLogicalTypeAnnotation
    (prim.getPrimitiveTypeName, ann) match {
      case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
      case (INT32, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        Some(java.math.BigDecimal.valueOf(v.asInstanceOf[Number].longValue, d.getScale).toString)
      case (INT64, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        Some(java.math.BigDecimal.valueOf(v.asInstanceOf[Number].longValue, d.getScale).toString)
      case ((BINARY | FIXED_LEN_BYTE_ARRAY), d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        Some(new java.math.BigDecimal(new java.math.BigInteger(
          v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes), d.getScale).toString)
      case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
        Some(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue).toString)
      case (INT64, t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        import LogicalTypeAnnotation.TimeUnit
        val micros = t.getUnit match {
          case TimeUnit.MICROS => v.asInstanceOf[Number].longValue
          case TimeUnit.MILLIS => Math.multiplyExact(v.asInstanceOf[Number].longValue, 1000L)
          case _ => return None // NANOS: read as BIGINT under nanosAsLong — scan
        }
        // adjusted-to-UTC (TimestampType) renders in the session zone;
        // NTZ renders the stored local datetime verbatim
        formatMicros(micros, if (t.isAdjustedToUTC) zone else java.time.ZoneOffset.UTC)
      case (INT32, _: LogicalTypeAnnotation.IntLogicalTypeAnnotation) |
           (INT64, _: LogicalTypeAnnotation.IntLogicalTypeAnnotation) |
           (INT32, null) | (INT64, null) =>
        Some(v.asInstanceOf[Number].longValue.toString)
      case (FLOAT, null) => Some(v.asInstanceOf[java.lang.Float].toString)
      case (DOUBLE, null) => Some(v.asInstanceOf[java.lang.Double].toString)
      case (BOOLEAN, null) => Some(v.asInstanceOf[java.lang.Boolean].toString)
      case _ => None // INT96 timestamps, UUIDs, … — scan fallback
    }
  }

  /** epoch-micros → Spark's timestamp CAST AS STRING rendering in `zone`:
    * "yyyy-MM-dd HH:mm:ss[.f…]" with trailing fraction zeros trimmed.
    * None for years outside [1, 9999]: Spark renders those with a sign /
    * 5+ digits ("+10000-…", "-0001-…") where %04d would emit "10000" /
    * "-001" — a divergence that breaks the exact-render contract the
    * min==max set-membership skip and utf8Compare ordering rely on, so
    * such files take the scan fallback instead. */
  private def formatMicros(us: Long, zone: java.time.ZoneId): Option[String] = {
    val secs = Math.floorDiv(us, 1000000L)
    val frac = Math.floorMod(us, 1000000L)
    val ldt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(secs, frac * 1000L), zone)
    if (ldt.getYear < 1 || ldt.getYear > 9999) return None
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d" +
      f" ${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    Some(if (frac == 0L) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse)
  }

  /** UTF-8 byte ordering — Spark's min/max over strings is binary
    * (UTF8String) order, NOT Java's UTF-16 compareTo: supplementary
    * characters rank above ￿ in byte order but below it in UTF-16, so
    * comparing stats with compareTo could prune a file that holds matching
    * rows. Compare the same way the stats were computed. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** order stats values as their column's type: numerics numerically,
    * everything else as rendered strings in UTF-8 byte order (CAST AS
    * STRING of timestamps and dates is fixed-format ASCII, so byte order =
    * chronological). A value that fails to parse (NaN/Infinity renderings
    * of a double column) compares as 0 = "ranges overlap" — the file stays
    * a candidate, never wrongly pruned. */
  private def statCompare(typeDdl: String): (String, String) => Int = {
    val numeric = Set("tinyint", "smallint", "int", "bigint", "float", "double")
    if (numeric(typeDdl) || typeDdl.startsWith("decimal"))
      (a, b) => try BigDecimal(a).compare(BigDecimal(b))
        catch { case _: NumberFormatException => 0 }
    else (a, b) => utf8Compare(a, b)
  }

  /** Write `df` (LOGICAL names) as a new immutable data-file batch under
    * the mapping's physical names; returns relative paths. */
  private def writeBatch(name: String, df: DataFrame,
                         cols: Seq[ColMap]): Seq[String] = {
    val physical =
      if (cols.isEmpty) df
      else df.select(cols.map(c =>
        col(c.logical).cast(c.typeDdl).as(c.physical)): _*)
    val batch = s"d-${UUID.randomUUID()}"
    val dir = root(name).resolve(batch)
    physical.write.mode("overwrite").parquet(dir.toString)
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).map(f => s"$batch/$f").toSeq
    finally s.close()
  }

  /** Clustered batch write: ONE Spark job whose output files each hold
    * exactly one value of `cluster` (hive-style `partitionBy` on a
    * synthetic column that is dropped from the data pages but decides the
    * directory), after consolidating each cluster value into a single task.
    * This is the write path a Z-order/partition layout wants: per-file
    * min/max stats and blooms get the tightest possible ranges WITHOUT a
    * write job per bucket (the append-per-bucket loop it replaces costs a
    * full job + commit per file — 32 sequential jobs for a 2×16-file
    * layout). Reading individual files never sees `__cluster`: explicit
    * file paths skip partition discovery. */
  private def writeClusteredBatch(name: String, df: DataFrame,
                                  cols: Seq[ColMap], cluster: Column,
                                  buckets: Int): Seq[String] = {
    val clustered = df.withColumn("__cluster", cluster)
    val physical =
      (if (cols.isEmpty) clustered
       else clustered.select(cols.map(c =>
         col(c.logical).cast(c.typeDdl).as(c.physical)) :+ col("__cluster"): _*))
        .repartition(buckets, col("__cluster"))
    val batch = s"d-${UUID.randomUUID()}"
    val dir = root(name).resolve(batch)
    physical.write.mode("overwrite").partitionBy("__cluster")
      .parquet(dir.toString)
    val s = Files.walk(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => root(name).relativize(p).toString).toSeq.sorted
    finally s.close()
  }

  /** The physical parquet schema a mapping implies. Sound because physical
    * types are immutable per live set: writeBatch casts to the mapping's
    * typeDdl, retype rewrites every live file atomically, and evolution
    * never retypes — so every live file either carries a column at exactly
    * this type or lacks it entirely (and the reader null-fills it). */
  private def physicalSchema(cols: Seq[ColMap]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c.physical,
        org.apache.spark.sql.types.DataType.fromDDL(c.typeDdl), nullable = true)))

  /** raw PHYSICAL-name read of `fs` under the mapping's known schema (no
    * logical rename/cast) — the shared no-inference read for stats/bloom
    * builders. Falls back to mergeSchema inference only for legacy
    * unmapped manifests. */
  private def readPhysical(name: String, cols: Seq[ColMap],
                           fs: Seq[String]): DataFrame =
    if (cols.isEmpty) spark.read.option("mergeSchema", "true")
      .parquet(fs.map(f => root(name).resolve(f).toString): _*)
    else spark.read.schema(physicalSchema(cols))
      .parquet(fs.map(f => root(name).resolve(f).toString): _*)

  /** read `fs` through the mapping: files predating an added column
    * null-fill (the reader null-fills requested-but-absent columns),
    * renamed columns surface under their logical name. The mapping KNOWS
    * the merged physical schema, so it is passed explicitly — the
    * `mergeSchema` footer-inference pass this replaces cost one extra
    * Spark job (a distributed footer read over every file) per table
    * read, pure fixed overhead at any scale and O(files) wasted I/O at
    * 100 TB. */
  private def readMapped(name: String, cols: Seq[ColMap],
                         fs: Seq[String]): DataFrame = {
    if (fs.isEmpty) {
      require(cols.nonEmpty,
        s"TxLogTable $name: empty unmapped table has no recoverable schema")
      return spark.emptyDataFrame.select(cols.map(c =>
        lit(null).cast(c.typeDdl).as(c.logical)): _*)
    }
    if (cols.isEmpty)
      spark.read.option("mergeSchema", "true")
        .parquet(fs.map(f => root(name).resolve(f).toString): _*)
    else
      spark.read.schema(physicalSchema(cols))
        .parquet(fs.map(f => root(name).resolve(f).toString): _*)
        .select(cols.map(c =>
          col(c.physical).cast(c.typeDdl).as(c.logical)): _*)
  }

  /** the deleted-key frame of one equality-delete file (physical key
    * columns, as written at delete time) */
  private def deleteKeys(name: String, e: EqDelete): DataFrame =
    spark.read.parquet(root(name).resolve(e.file).toString)

  /** read `fs` under `cols` with the applicable equality deletes
    * anti-joined in. Files are grouped by their applicable delete-file
    * SET (normally one group: everything pre-delete), each group
    * anti-joins its deletes ON THE PHYSICAL key columns before the
    * logical mapping applies — physical names are immutable, so deletes
    * survive renames. */
  private def readWithDeletes(name: String, cols: Seq[ColMap],
                              fs: Seq[String], edels: Seq[EqDelete]): DataFrame = {
    val applicable = edels.filter(_.scope.exists(fs.contains))
    if (applicable.isEmpty) return readMapped(name, cols, fs)
    val groups = fs.groupBy(f => applicable.filter(_.scope(f)).map(_.file))
    groups.map { case (delFiles, groupFs) =>
      val raw =
        if (cols.isEmpty) spark.read.option("mergeSchema", "true")
          .parquet(groupFs.map(f => root(name).resolve(f).toString): _*)
        else spark.read.schema(physicalSchema(cols))
          .parquet(groupFs.map(f => root(name).resolve(f).toString): _*)
      val surviving = applicable.filter(e => delFiles.contains(e.file))
        .foldLeft(raw) { (df, e) =>
          // physical key columns are always present: delete files are only
          // scoped to data files that were live (hence schema-complete for
          // the keys) when the delete committed
          df.join(deleteKeys(name, e), e.keyPhys, "left_anti")
        }
      if (cols.isEmpty) surviving
      else surviving.select(cols.map(c =>
        col(c.physical).cast(c.typeDdl).as(c.logical)): _*)
    }.reduce(_ unionByName _)
  }

  /** read the current snapshot (resolves the manifest ONCE — concurrent
    * commits do not move this DataFrame's version) */
  def read(name: String): DataFrame = readVersion(name,
    currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist")))

  /** time travel */
  def readVersion(name: String, v: Long): DataFrame =
    readWithDeletes(name, mapping(name, v), files(name, v),
      equalityDeletes(name, v))

  /** RESTORE TABLE ... TO VERSION (Delta RESTORE): re-commit an old
    * version's manifest verbatim as the NEW head — a metadata-only undo
    * that touches zero data files and preserves the full history (the
    * bad versions stay time-travelable until vacuum's horizon reclaims
    * them; data files of the restored version are re-referenced, so the
    * same vacuum keeps them live). Roll-forward is equally possible:
    * restore to any retained version, in either direction. */
  def restore(name: String, toVersion: Long): Unit = {
    val head = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    require(versions(name).contains(toVersion),
      s"TxLogTable $name: version $toVersion is not retained " +
        s"(have ${versions(name)})")
    if (toVersion == head) return
    if (!tryCommit(name, head + 1, manifestLines(name, toVersion)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on restore — retry")
  }

  /** read a SUBSET of a version's live files under that version's column
    * mapping — the primitive behind file-pruned probes (the caller still
    * applies its exact predicate; this only shrinks the scan). */
  def readFiles(name: String, v: Long, subset: Seq[String]): DataFrame = {
    val live = files(name, v)
    require(subset.forall(live.contains),
      s"TxLogTable $name: readFiles over non-live files " +
        s"${subset.filterNot(live.contains)}")
    readWithDeletes(name, mapping(name, v), subset, equalityDeletes(name, v))
  }

  /** MERGE-ON-READ row-level DELETE (Iceberg equality deletes / Delta
    * deletion vectors): rows of the current snapshot matching `cond` have
    * their `keyCols` written to ONE key file; no data file is touched.
    * Readers anti-join the keys; `compact` (or any rewrite of the scoped
    * files) materializes the delete and drops the tombstone. A later
    * append may re-insert a deleted key and is visible — deletes are
    * scoped to the files live at delete time. Returns the number of
    * distinct deleted keys. */
  def deleteWhere(name: String, cond: org.apache.spark.sql.Column,
                  keyCols: Seq[String]): Long =
    deleteKeysOf(name, keyCols) { (snapshot, _) => snapshot.filter(cond) }

  /** [[deleteWhere]] with the doomed keys given as a DATAFRAME instead of
    * a `Column` predicate — the shape a production GDPR/forget batch has
    * (millions of subject keys). The key set stays distributed end to
    * end: it is semi-joined against the current snapshot (so the
    * tombstone only carries keys that exist; a driver-side
    * `isin(keys: _*)` literal breaks the PLAN at ~thousands of keys,
    * long before it breaks the driver). `keyDf` must carry the logical
    * `keyCols`. */
  def deleteWhereKeys(name: String, keyDf: DataFrame,
                      keyCols: Seq[String]): Long =
    deleteKeysOf(name, keyCols) { (snapshot, _) =>
      snapshot.join(keyDf.select(keyCols.map(col): _*), keyCols, "leftsemi")
    }

  /** shared MoR-delete tail: derive doomed keys from the current snapshot
    * (existing tombstones applied — a re-delete of an already-dead key is
    * a harmless no-op row), write them as ONE key file, commit the
    * equality-delete scoped to the files live now. Returns the number of
    * distinct deleted keys. */
  private def deleteKeysOf(name: String, keyCols: Seq[String])
      (restrict: (DataFrame, Seq[ColMap]) => DataFrame): Long = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    val live = files(name, v)
    val phys = keyCols.map(kc => m.cols.find(_.logical == kc).getOrElse(
      throw new IllegalArgumentException(
        s"TxLogTable $name: no column $kc")))
    val keys = restrict(readWithDeletes(name, m.cols, live, m.edels), m.cols)
      .select(phys.map(c => col(c.logical).cast(c.typeDdl).as(c.physical)): _*)
      .distinct()
      .localCheckpoint()
    val n = keys.count()
    if (n == 0) return 0L
    val batch = s"ed-${UUID.randomUUID()}"
    val dir = root(name).resolve(batch)
    keys.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val delFile = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).map(f => s"$batch/$f").toSeq.head
      finally s.close()
    }
    val withDel = m.copy(edels =
      m.edels :+ EqDelete(delFile, phys.map(_.physical), live.toSet))
    if (!tryCommit(name, v + 1, renderM(withDel, live)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on deleteWhere — " +
          "re-derive from the new head and retry")
    n
  }

  /** S6 — incremental insert: appends never conflict semantically, so a
    * lost CAS re-reads the head and retries against it. */
  def append(name: String, df: DataFrame): Unit = { appendTxn(name, df, None); () }

  /** Append `df` as one CLUSTERED batch: a single write job that lays the
    * rows out one-cluster-value-per-file (see writeClusteredBatch). The
    * commit protocol is identical to `append`. Use after `setStatsColumns`
    * /`setBloomColumn`-style skipping is in play: the layout is what makes
    * per-file pruning bite. `cluster` is evaluated against `df`'s logical
    * columns. */
  def appendClustered(name: String, df: DataFrame, cluster: Column,
                      buckets: Int): Unit = {
    var done = false
    var batch: Option[(Seq[ColMap], Seq[String])] = None
    while (!done) {
      val head = currentVersion(name)
      val m = head.map(metaOf(name, _))
        .getOrElse(Meta(identityMapping(df), Nil, Map.empty))
      requireChecks(m, df, s"$name appendClustered")
      val added = batch match {
        case Some((c, fs)) if c == m.cols => fs
        case _ =>
          val fs = writeClusteredBatch(name, df, m.cols, cluster, buckets)
          batch = Some((m.cols, fs)); fs
      }
      val base = head.map(files(name, _)).getOrElse(Seq.empty)
      val withStats =
        m.copy(stats = m.stats ++ batchStats(name, added, m.statsCols))
      done = tryCommit(name, head.getOrElse(0L) + 1,
        renderM(withStats, base ++ added))
    }
  }

  /** Append with AUTOMATIC SCHEMA EVOLUTION (Delta's mergeSchema write
    * option): columns in `df` the table lacks are added first as
    * metadata-only DDL (older files null-fill), then the batch appends;
    * columns the table has but `df` lacks null-fill the new batch.
    * Existing columns must keep their type — a changed type is a real
    * contract break and throws rather than silently casting. */
  def appendEvolve(name: String, df: DataFrame): Unit = {
    currentVersion(name) match {
      case None => append(name, df)
      case Some(v) =>
        val m = metaOf(name, v)
        require(m.cols.nonEmpty,
          s"TxLogTable $name: appendEvolve needs a mapped table")
        val incoming = df.schema.fields.map(f => f.name -> f.dataType.catalogString).toMap
        m.cols.foreach { c =>
          incoming.get(c.logical).foreach { t =>
            require(t == c.typeDdl,
              s"TxLogTable $name: column ${c.logical} is ${c.typeDdl}, " +
                s"incoming batch has $t — schema evolution never retypes")
          }
        }
        val newCols = df.schema.fields
          .filter(f => !m.cols.exists(_.logical == f.name))
        newCols.foreach(f => addColumn(name, f.name, f.dataType.catalogString))
        val after = metaOf(name, currentVersion(name).get)
        val aligned = df.select(after.cols.map { c =>
          if (incoming.contains(c.logical)) col(c.logical)
          else lit(null).cast(c.typeDdl).as(c.logical)
        }: _*)
        append(name, aligned)
    }
  }

  /** Exactly-once append (the Delta txnAppId/txnVersion contract): the
    * commit records (appId → batchVersion) in the manifest, and an append
    * whose batchVersion is ≤ the appId's recorded marker is recognized as
    * a REPLAY and skipped (returns false). With monotone batch versions
    * per appId — Spark's foreachBatch batchId is exactly that — task
    * retries, sink restarts, and checkpoint replays all collapse to one
    * committed copy. The check re-runs inside the CAS retry loop, so a
    * concurrent replayer racing this commit cannot double-apply. */
  def appendOnce(name: String, df: DataFrame, appId: String,
                 batchVersion: Long): Boolean = {
    // the marker is one tab-separated manifest line; a tab or line break
    // inside appId would corrupt the manifest for ALL future readers
    // (txnVersions split, or a bogus un-prefixed "file" line)
    require(appId.nonEmpty && !appId.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"appendOnce: appId must be non-empty and free of tabs/line breaks, got ${appId.map(c => if (c.isControl) f"\\u${c.toInt}%04x" else c.toString).mkString}")
    appendTxn(name, df, Some(appId -> batchVersion))
  }

  private def appendTxn(name: String, df: DataFrame,
                        txn: Option[(String, Long)]): Boolean = {
    var done = false
    var batch: Option[(Seq[ColMap], Seq[String])] = None
    while (!done) {
      val head = currentVersion(name)
      val m = head.map(metaOf(name, _))
        .getOrElse(Meta(identityMapping(df), Nil, Map.empty))
      // a skipped replay can leave an already-written batch from a lost
      // CAS iteration as orphan files — vacuum's orphan-grace sweep
      // reclaims them, same as any crashed append
      if (txn.exists { case (app, bv) => m.txns.get(app).exists(_ >= bv) }) {
        // SKIPPED, but still CONSUMED: under foreachBatch the plan may
        // carry stateful operators (flatMapGroupsWithState) whose state
        // must advance through EVERY micro-batch — an unexecuted skip
        // leaves a state hole for the first non-replayed batch, and
        // Spark's state-store commit validation fails the query outright
        // ("expected N commits but got 0"). A noop-sink write executes
        // all partitions without landing data. Only on the first CAS
        // iteration (batch == None): if a lost race already wrote the
        // batch, the plan has been executed.
        if (batch.isEmpty) df.write.format("noop").mode("overwrite").save()
        return false // replay — skip
      }
      requireChecks(m, df, s"$name append")
      val added = batch match {
        // reuse the already-written batch on a lost CAS — unless the new
        // head changed the mapping out from under us (DDL race): physical
        // names could differ, so rewrite under the new mapping
        case Some((c, fs)) if c == m.cols => fs
        case _ => val fs = writeBatch(name, df, m.cols); batch = Some((m.cols, fs)); fs
      }
      val base = head.map(files(name, _)).getOrElse(Seq.empty)
      val withStats = m.copy(stats = m.stats ++ batchStats(name, added, m.statsCols),
        txns = m.txns ++ txn)
      done = tryCommit(name, head.getOrElse(0L) + 1,
        renderM(withStats, base ++ added))
    }
    true
  }

  /** S5 — table materialization / full refresh: the schema resets to `df`'s
    * (a fresh identity mapping — prior DDL history does not constrain a
    * full rebuild). `expectedVersion` (CAS guard) makes read-modify-
    * overwrite safe: pass the version the new contents were derived from; a
    * concurrent commit aborts loudly instead of silently clobbering it. */
  def overwrite(name: String, df: DataFrame,
                expectedVersion: Option[Long] = None): Unit = {
    val cols = identityMapping(df)
    val head = currentVersion(name)
    // CAS guard BEFORE the batch write: a stale overwrite aborts without
    // having produced an orphaned table-sized batch
    expectedVersion.foreach { ev =>
      require(head.contains(ev) || (ev == 0L && head.isEmpty),
        s"TxLogTable $name: expected version $ev but head is $head — " +
          "concurrent commit detected, re-derive and retry")
    }
    // stats columns survive a full refresh where the (reset, physical =
    // logical) schema still carries them
    val statsCols = head.map(statsColumns(name, _)).getOrElse(Nil)
      .filter(sc => cols.exists(_.physical == sc))
    // CHECK constraints survive a full refresh (Delta table-property
    // semantics) and the replacement rows must already satisfy them
    val checks = head.map(checkConstraints(name, _)).getOrElse(Map.empty)
    requireChecks(Meta(cols, Nil, Map.empty, checks = checks), df,
      s"$name overwrite")
    val added = writeBatch(name, df, cols)
    // txn markers survive a full refresh: a replayed streaming batch must
    // still be recognized after someone rebuilds the table
    val m = Meta(cols, statsCols, batchStats(name, added, statsCols),
      head.map(txnVersions(name, _)).getOrElse(Map.empty), checks = checks)
    if (!tryCommit(name, head.getOrElse(0L) + 1, renderM(m, added)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on overwrite — re-derive and retry")
  }

  /** S7 — file-level MERGE, the primitive a row-level MERGE compiles to:
    * `rewrite` maps the (logical) rows of the files it touches; files not
    * in `touched` survive untouched. One version swaps (removed, added)
    * atomically; a concurrent commit aborts loudly (rewrites must re-derive
    * from the new head, same contract as Delta's conflict detection). */
  def replaceFiles(name: String, touched: Seq[String],
                   retype: Map[String, String] = Map.empty)
                  (rewrite: DataFrame => DataFrame): Unit = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val live = files(name, v)
    val m = metaOf(name, v)
    require(touched.forall(live.contains),
      s"TxLogTable $name: replaceFiles over non-live files " +
        s"${touched.filterNot(live.contains)}")
    // retype commits a column's manifest type WITH the rewrite, atomically.
    // Only sound when every live file is rewritten: a surviving old file
    // would be read back through the new type's cast (e.g. a hex STRING
    // UTF-8-mangled into BINARY), so a partial rewrite + retype refuses.
    retype.keys.foreach(c => require(m.cols.exists(_.logical == c),
      s"TxLogTable $name: retype of unknown column $c"))
    require(retype.isEmpty || touched.toSet == live.toSet,
      s"TxLogTable $name: retype requires rewriting ALL live files")
    val newCols = m.cols.map(c =>
      retype.get(c.logical).fold(c)(t => c.copy(typeDdl = t)))
    val added =
      if (touched.isEmpty) Seq.empty
      // the rewrite sees the DELETE-APPLIED rows of the touched files (and
      // its output files leave every delete's scope via renderM), so
      // tombstoned rows can never be resurrected by a rewrite
      else writeBatch(name,
        rewrite(readWithDeletes(name, m.cols, touched, m.edels)), newCols)
    val next = live.filterNot(touched.contains) ++ added
    val withStats = m.copy(cols = newCols,
      stats = m.stats ++ batchStats(name, added, m.statsCols))
    if (!tryCommit(name, v + 1, renderM(withStats, next)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on replaceFiles — " +
          "re-derive from the new head and retry")
  }

  /** S7 — row-level MERGE compiled onto [[replaceFiles]]' primitive: rows of
    * `name` whose `keyCols` match a `source` row are replaced by it,
    * unmatched `source` rows are inserted — the semantics of the reference's
    * `MERGE INTO` rehash (`rehash_single_hub.sql:84-111`). FILE-PRUNED: a
    * key-presence probe (`input_file_name` + semi-join) finds the files that
    * actually hold matched keys; only those are rewritten, every other live
    * file carries over by identity. One atomic version publishes
    * (removed ∪ added); readers of the old version stay consistent. The
    * probe's collected output is file PATHS — metadata-scale, like a
    * partition listing. */
  def merge(name: String, source: DataFrame, keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val live = files(name, v)
    val m = metaOf(name, v)
    // the source is evaluated by THREE jobs (key-range probe, touched-file
    // probe, survivors write) — materialize it once so a nondeterministic
    // input (limit without order, sampling, now()) cannot yield different
    // key sets between the probe and the write, which would leave a matched
    // key's old row alive next to its inserted replacement
    val src = source.localCheckpoint()
    requireChecks(m, src, s"$name merge source")
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    // data skipping: the probe scans only files whose per-file [min,max]
    // intersects the source's key range — with stats on the key column a
    // clustered table turns the probe from O(table) into O(overlap)
    val probeFiles = {
      val statted = keyCols.flatMap(kc =>
        m.cols.find(_.logical == kc).map(c => (kc, c))
          .filter { case (_, c) => m.statsCols.contains(c.physical) })
      if (statted.isEmpty) live
      else {
        val rangeAggs = statted.flatMap { case (kc, _) => Seq(
          fmin(col(kc)).cast("string").as(s"__mn_$kc"),
          fmax(col(kc)).cast("string").as(s"__mx_$kc")) }
        val r = srcKeys.agg(rangeAggs.head, rangeAggs.tail: _*).head()
        statted.foldLeft(live) { case (cand, (kc, c)) =>
          val (srcMn, srcMx) = (r.getAs[String](s"__mn_$kc"), r.getAs[String](s"__mx_$kc"))
          if (srcMn == null) cand
          else {
            val cmp = statCompare(c.typeDdl)
            cand.filter { f =>
              m.stats.get((f, c.physical)) match {
                case Some((mn, mx)) => cmp(mx, srcMn) >= 0 && cmp(mn, srcMx) <= 0
                case None           => true // no stats: unprunable, safe
              }
            }
          }
        }
      }
    }
    val touchedAbs =
      if (probeFiles.isEmpty) Array.empty[String]
      else readMapped(name, m.cols, probeFiles)
        .withColumn("__file", input_file_name())
        .join(srcKeys, keyCols, "left_semi")
        .select("__file").distinct().collect().map(_.getString(0))
    val touched = probeFiles.filter(f => touchedAbs.exists(_.endsWith("/" + f)))
    val tableCols = m.cols.map(_.logical).toIndexedSeq
    val survivors =
      if (touched.isEmpty) src.select(tableCols.map(col): _*)
      else readWithDeletes(name, m.cols, touched, m.edels)
        .join(srcKeys, keyCols, "left_anti")
        .unionByName(src.select(tableCols.map(col): _*))
    val added = writeBatch(name, survivors, m.cols)
    val withStats = m.copy(stats = m.stats ++ batchStats(name, added, m.statsCols))
    if (!tryCommit(name, v + 1,
        renderM(withStats, live.filterNot(touched.contains) ++ added)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on merge — " +
          "re-derive from the new head and retry")
  }

  /** Enable per-file min/max stats on `logicalCols` (Delta/Iceberg-style
    * data skipping) and backfill them for all live files in one
    * column-pruned ANALYZE pass. Stats are keyed by PHYSICAL name, so they
    * survive renames; files written before enablement that the backfill
    * missed (or all-NULL files) simply stay unprunable. */
  def setStatsColumns(name: String, logicalCols: Seq[String]): Unit = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    val phys = logicalCols.map { lc =>
      m.cols.find(_.logical == lc).getOrElse(
        throw new IllegalArgumentException(
          s"TxLogTable $name: no column $lc")).physical
    }
    val live = files(name, v)
    val withStats = m.copy(statsCols = phys.distinct,
      stats = batchStats(name, live, phys.distinct))
    if (!tryCommit(name, v + 1, renderM(withStats, live)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on setStatsColumns — retry")
  }

  /** The files of the current version possibly holding a `logicalCol` value
    * in [lo, hi] (rendered as strings the way stats are: CAST AS STRING).
    * Complete by construction: a file is only skipped when its recorded
    * min/max range provably cannot intersect. */
  def candidateFiles(name: String, logicalCol: String,
                     lo: String, hi: String): Seq[String] = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    val c = m.cols.find(_.logical == logicalCol).getOrElse(
      throw new IllegalArgumentException(s"TxLogTable $name: no column $logicalCol"))
    val cmp = statCompare(c.typeDdl)
    files(name, v).filter { f =>
      m.stats.get((f, c.physical)) match {
        case Some((mn, mx)) => cmp(mx, lo) >= 0 && cmp(mn, hi) <= 0
        case None           => true
      }
    }
  }

  /** Read only the files possibly relevant to `logicalCol` ∈ [lo, hi] — the
    * caller still applies its exact predicate; this prunes the scan. */
  def readPruned(name: String, logicalCol: String, lo: String, hi: String): DataFrame = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    readWithDeletes(name, mapping(name, v),
      candidateFiles(name, logicalCol, lo, hi), equalityDeletes(name, v))
  }

  // ---- per-file BLOOM FILTERS: point-lookup file skipping ----------------
  // min/max stats prune RANGE predicates but are useless for equality
  // probes into an unclustered table (every file's [min,max] spans the key
  // domain). A per-file Bloom filter prunes point lookups regardless of
  // layout — Iceberg keeps these in Puffin sidecars, Parquet in the
  // footer; here the (base64) bitset lives on a manifest line, which is
  // fine at demo scale and would move to a sidecar file at production
  // manifest sizes. Missing blooms (files appended after enablement) are
  // simply unprunable — the same safe default as missing stats.

  private val BloomColHeader = "#bloomcol\t"
  private val FBloomHeader = "#fbloom\t"
  private val BloomSeeds = 4

  /** enabled bloom columns: physical name → filter size in bits */
  def bloomColumns(name: String, v: Long): Map[String, Int] =
    manifestLines(name, v).filter(_.startsWith(BloomColHeader)).map { l =>
      val p = l.stripPrefix(BloomColHeader).split('\t')
      p(0) -> p(1).toInt
    }.toMap

  /** per-file bloom bitsets: (file, physicalCol) → base64 bitset */
  def fileBlooms(name: String, v: Long): Map[(String, String), String] =
    manifestLines(name, v).filter(_.startsWith(FBloomHeader)).map { l =>
      val p = l.stripPrefix(FBloomHeader).split('\t')
      (p(0), p(1)) -> p(2)
    }.toMap

  /** the BloomSeeds bit positions of a value — MUST match [[bloomPosCols]]
    * (same md5-of-"value:seed" derivation on both the build expression and
    * the driver probe) */
  private def bloomPositions(value: String, nbits: Int): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until BloomSeeds).map { k =>
      val hex = md.digest(s"$value:$k".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % nbits).toInt
    }
  }

  /** the same positions as a codegen'd column expression over `c` */
  private def bloomPosCols(c: org.apache.spark.sql.Column, nbits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, concat, conv, lit, md5, pmod, substring}
    array((0 until BloomSeeds).map { k =>
      pmod(conv(substring(md5(concat(c.cast("string"), lit(s":$k"))), 1, 8), 16, 10)
        .cast("long"), lit(nbits.toLong)).cast("int")
    }: _*)
  }

  /** One pass over `fs` building a bloom bitset per file for `physCol`:
    * ONE aggregated row per file (bit positions deduped map-side by
    * collect_set) instead of collecting NDV×seeds individual position
    * rows to the driver — at 10k files this moves file-count rows, not
    * key-count rows. Shared by [[setBloomColumn]] and the compaction
    * rewrites (which must re-bloom the files they emit, or the skipping
    * property silently dies with the replaced files). */
  private def buildFileBlooms(name: String, cols: Seq[ColMap], fs: Seq[String],
                              physCol: String,
                              nbits: Int): Map[(String, String), String] = {
    import org.apache.spark.sql.functions.{col => fcol, collect_set, explode, input_file_name}
    if (fs.isEmpty) return Map.empty
    val raw = readPhysical(name, cols, fs)
      .select(input_file_name().as("__file"), fcol(physCol))
    val posRows = raw.distinct()
      .select(fcol("__file"), explode(bloomPosCols(fcol(physCol), nbits)).as("pos"))
      .groupBy(fcol("__file")).agg(collect_set(fcol("pos")).as("ps"))
      .collect()
    posRows.map { row =>
      // map absolute → manifest-relative by suffix (clustered batches nest
      // a partition dir, so the depth under the batch dir is not fixed)
      val abs = row.getString(0)
      val rel = fs.find(f => abs.endsWith("/" + f)).getOrElse(
        throw new IllegalStateException(s"bloom build saw non-live file $abs"))
      val bits = new java.util.BitSet(nbits)
      row.getSeq[Int](1).foreach(bits.set)
      (rel, physCol) ->
        java.util.Base64.getEncoder.encodeToString(bits.toByteArray)
    }.toMap
  }

  /** Fresh blooms for every enabled bloom column over a rewrite's output
    * files. Compaction replaces EVERY data file, so carrying the old
    * per-file blooms forward would leave zero live bloom entries and
    * [[bloomCandidateFiles]] would silently degrade to "all files" while
    * bloomCols still advertises skipping. Same nbits as the original
    * enablement (NDV is unchanged by a rewrite). */
  private def rebuiltBlooms(name: String, m: Meta,
                            added: Seq[String]): Map[(String, String), String] =
    m.bloomCols.foldLeft(Map.empty[(String, String), String]) {
      case (acc, (physCol, nbits)) =>
        acc ++ buildFileBlooms(name, m.cols, added, physCol, nbits)
    }

  /** Enable a Bloom filter on `logicalCol` and build one per live file in
    * a single pass (distinct bit positions per file, collected at
    * metadata scale — ≤ nbits ints per file). `bitsPerKey` ≈ 20 gives
    * ~0.1% false-positive rate at 4 probes. */
  def setBloomColumn(name: String, logicalCol: String, bitsPerKey: Int = 20): Unit = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col => fcol, collect_set, explode, input_file_name}
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    val c = m.cols.find(_.logical == logicalCol).getOrElse(
      throw new IllegalArgumentException(s"TxLogTable $name: no column $logicalCol"))
    val live = files(name, v)
    val raw = readPhysical(name, m.cols, live)
      .select(input_file_name().as("__file"), fcol(c.physical))
    // sizing only needs an NDV ESTIMATE (an overshoot widens the filter, an
    // undershoot mildly raises FPR): approx_count_distinct is one map-side
    // HLL pass, where exact countDistinct shuffles every distinct key. The
    // 1.2 margin covers HLL's ~2% error band with room to spare.
    val maxNdv = (raw.agg(approx_count_distinct(fcol(c.physical)))
      .head().getLong(0) * 1.2).toLong
    val nbits = math.max(1024L,
      java.lang.Long.highestOneBit(math.max(1L, maxNdv * bitsPerKey) * 2 - 1)).toInt
    val byFile = buildFileBlooms(name, m.cols, live, c.physical, nbits)
    val m2 = m.copy(bloomCols = m.bloomCols + (c.physical -> nbits),
      blooms = m.blooms ++ byFile)
    if (!tryCommit(name, v + 1, renderM(m2, live)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on setBloomColumn — retry")
  }

  /** The current version's files possibly containing `value` in
    * `logicalCol`: a file is skipped only when its bloom provably lacks
    * one of the value's bit positions — no false negatives by
    * construction; files without a bloom stay candidates. */
  def bloomCandidateFiles(name: String, logicalCol: String, value: String): Seq[String] = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    val c = m.cols.find(_.logical == logicalCol).getOrElse(
      throw new IllegalArgumentException(s"TxLogTable $name: no column $logicalCol"))
    val nbitsOpt = bloomColumns(name, v).get(c.physical)
    val blooms = fileBlooms(name, v)
    nbitsOpt match {
      case None => files(name, v)
      case Some(nbits) =>
        val pos = bloomPositions(value, nbits)
        files(name, v).filter { f =>
          blooms.get((f, c.physical)) match {
            case None => true
            case Some(b64) =>
              val bits = decodedBloom(name, v, f, c.physical, b64)
              pos.forall(bits.get)
          }
        }
    }
  }

  /** decoded bitsets, memoized per (table, version, file, column): a
    * bitset is hundreds of KB of base64 — decoding it once per PROBE
    * instead of once per VERSION dominated point-lookup cost */
  private val bloomBitsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, String, String), java.util.BitSet]()

  private def decodedBloom(name: String, v: Long, file: String,
                           col: String, b64: String): java.util.BitSet = {
    // eviction outside the lambda — CHM forbids self-mutation in compute
    if (bloomBitsCache.size > 1024) bloomBitsCache.clear()
    bloomBitsCache.computeIfAbsent((name, v, file, col), { _ =>
      java.util.BitSet.valueOf(java.util.Base64.getDecoder.decode(b64))
    })
  }

  // ---- SQL-surface file skipping (the FileIndex seam) --------------------
  // registerViews makes vault tables queryable from plain `spark.sql`, but
  // candidateFiles / bloomCandidateFiles were store-API-only: a
  // `SELECT … FROM t WHERE k = …` over a registered view scanned every
  // live file. The Spark-first fix is the seam Delta (TahoeFileIndex) and
  // Iceberg use on Spark: FileSourceScanExec hands its pushed-down data
  // filters to FileIndex.listFiles, so a manifest-aware index prunes files
  // by min/max stats and per-file blooms BEFORE tasks are scheduled. At
  // 100 TB a point probe schedules O(candidate files) tasks instead of
  // O(table), and it composes with Catalyst for free — the predicate is
  // still applied exactly row-wise; the index only shrinks the scan.

  private final class ManifestFileIndex(name: String, v: Long, m: Meta,
                                        live: Seq[String])
      extends org.apache.spark.sql.execution.datasources.FileIndex {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.execution.datasources.{FileStatusWithMetadata, PartitionDirectory}
    import org.apache.spark.sql.types._

    private val hRoot = new org.apache.hadoop.fs.Path(root(name).toUri)
    private val statuses: Map[String, org.apache.hadoop.fs.FileStatus] = {
      val fs = hRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      live.map(f => f -> fs.getFileStatus(
        new org.apache.hadoop.fs.Path(root(name).resolve(f).toUri))).toMap
    }

    override def rootPaths: Seq[org.apache.hadoop.fs.Path] = Seq(hRoot)
    override def partitionSchema: StructType = new StructType()
    override def sizeInBytes: Long = statuses.values.map(_.getLen).sum
    override def inputFiles: Array[String] =
      live.map(f => root(name).resolve(f).toString).toArray
    override def refresh(): Unit = ()

    /** stats are stored CAST-AS-STRING; literals render the same way.
      * None = unrenderable type → that conjunct never prunes (safe). */
    private def render(value: Any, dt: DataType): Option[String] = dt match {
      case StringType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType => Option(value).map(_.toString)
      case DateType => Option(value).map(d =>
        java.time.LocalDate.ofEpochDay(d.asInstanceOf[Int].toLong).toString)
      case _ => None
    }

    private def physCol(e: Expression): Option[ColMap] = e match {
      case a: AttributeReference => m.cols.find(_.physical == a.name)
      case _ => None
    }

    /** keep files whose [min,max] could intersect the probe interval;
      * strict bounds prune the boundary file too (max == lo proves no row
      * satisfies `col > lo`) */
    private def rangeKeep(c: ColMap, lo: Option[String], hi: Option[String],
                          loStrict: Boolean = false,
                          hiStrict: Boolean = false): String => Boolean = {
      val cmp = statCompare(c.typeDdl)
      f => m.stats.get((f, c.physical)) match {
        case Some((mn, mx)) =>
          lo.forall(l => if (loStrict) cmp(mx, l) > 0 else cmp(mx, l) >= 0) &&
            hi.forall(h => if (hiStrict) cmp(mn, h) < 0 else cmp(mn, h) <= 0)
        case None => true
      }
    }

    /** `col = value`: min/max AND bloom, both sound — a file is dropped
      * only on proof of absence; missing stats/blooms stay candidates */
    private def eqKeep(c: ColMap, s: String): String => Boolean = {
      val byStats = rangeKeep(c, Some(s), Some(s))
      m.bloomCols.get(c.physical) match {
        case None => byStats
        case Some(nbits) =>
          val pos = bloomPositions(s, nbits)
          f => byStats(f) && (m.blooms.get((f, c.physical)) match {
            case None => true
            case Some(b64) =>
              pos.forall(decodedBloom(name, v, f, c.physical, b64).get)
          })
      }
    }

    private def eqFor(a: Expression, x: Any, dt: DataType): Option[String => Boolean] =
      physCol(a).flatMap(c => render(x, dt).map(eqKeep(c, _)))
    private def rgFor(a: Expression, x: Any, dt: DataType, isLo: Boolean,
                      strict: Boolean): Option[String => Boolean] =
      physCol(a).flatMap(c => render(x, dt).map(s =>
        if (isLo) rangeKeep(c, Some(s), None, loStrict = strict)
        else rangeKeep(c, None, Some(s), hiStrict = strict)))

    /** one pushed conjunct → a sound file-keep predicate; IN keeps a file
      * when ANY value could be present; OR prunes only when both arms can;
      * unsupported shapes never prune. */
    private def keepFor(e: Expression): Option[String => Boolean] = e match {
      case EqualTo(a, Literal(x, dt)) => eqFor(a, x, dt)
      case EqualTo(Literal(x, dt), a) => eqFor(a, x, dt)
      case EqualNullSafe(a, Literal(x, dt)) if x != null => eqFor(a, x, dt)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val ks = vs.map { case Literal(x, dt) => eqFor(a, x, dt) }
        if (ks.exists(_.isEmpty)) None
        else Some(f => ks.flatten.exists(_(f)))
      case InSet(a, vs) if vs.nonEmpty =>
        val ks = vs.toSeq.map(x => eqFor(a, x, a.dataType))
        if (ks.exists(_.isEmpty)) None
        else Some(f => ks.flatten.exists(_(f)))
      case GreaterThan(a, Literal(x, dt))          => rgFor(a, x, dt, isLo = true,  strict = true)
      case GreaterThanOrEqual(a, Literal(x, dt))   => rgFor(a, x, dt, isLo = true,  strict = false)
      case LessThan(a, Literal(x, dt))             => rgFor(a, x, dt, isLo = false, strict = true)
      case LessThanOrEqual(a, Literal(x, dt))      => rgFor(a, x, dt, isLo = false, strict = false)
      case GreaterThan(Literal(x, dt), a)          => rgFor(a, x, dt, isLo = false, strict = true)
      case GreaterThanOrEqual(Literal(x, dt), a)   => rgFor(a, x, dt, isLo = false, strict = false)
      case LessThan(Literal(x, dt), a)             => rgFor(a, x, dt, isLo = true,  strict = true)
      case LessThanOrEqual(Literal(x, dt), a)      => rgFor(a, x, dt, isLo = true,  strict = false)
      // prefix probe: every p-prefixed string sorts >= p, so the lower
      // bound alone prunes files whose max < p — sound without the
      // fiddly next-after-prefix upper bound (utf8 byte order vs string
      // order makes a tight hi unsafe to hand-roll)
      case StartsWith(a, Literal(x, StringType)) if x != null =>
        physCol(a).map(c => rangeKeep(c, Some(x.toString), None))
      case And(l, r) => (keepFor(l), keepFor(r)) match {
        case (Some(a), Some(b)) => Some(f => a(f) && b(f))
        case (one, other)       => one.orElse(other)
      }
      case Or(l, r) => (keepFor(l), keepFor(r)) match {
        case (Some(a), Some(b)) => Some(f => a(f) || b(f))
        case _                  => None
      }
      case _ => None
    }

    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val keeps = dataFilters.flatMap(keepFor)
      val cand = if (keeps.isEmpty) live else live.filter(f => keeps.forall(_(f)))
      Seq(PartitionDirectory(InternalRow.empty,
        cand.map(f => FileStatusWithMetadata(statuses(f), Map.empty))))
    }
  }

  /** The current snapshot as a DataFrame whose SCAN prunes files from the
    * manifest's min/max stats and per-file blooms whenever Catalyst pushes
    * a predicate down — [[read]]'s exact semantics (typed column mapping +
    * delete-time-scoped equality deletes) over a skipping-capable
    * FileIndex. [[registerViews]] registers THIS, so a plain
    * `spark.sql("SELECT … FROM t WHERE k = 42")` schedules only candidate
    * files — the store-API `candidateFiles`/`bloomCandidateFiles` economy
    * reached from the dbt-user SQL surface. */
  def sqlScan(name: String): DataFrame = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.sql.types.{DataType, StructField, StructType}
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    val live = files(name, v)
    // legacy unmapped manifests and empty tables declare no physical
    // schema — serve the plain snapshot read (nothing to prune anyway)
    if (m.cols.isEmpty || live.isEmpty) return readVersion(name, v)
    val idx = new ManifestFileIndex(name, v, m, live)
    val dataSchema = StructType(m.cols.map(c =>
      StructField(c.physical, DataType.fromDDL(c.typeDdl))))
    val rel = HadoopFsRelation(idx, new StructType(), dataSchema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    val base = spark.baseRelationToDataFrame(rel)
    // equality deletes, scoped exactly as readWithDeletes: a tombstone
    // kills a key only inside the files live at delete time, so a later
    // re-insert of the key survives. File identity comes from
    // input_file_name, made manifest-relative by a suffix extract (the
    // table dir name is matched greedily, i.e. at its LAST occurrence).
    val cleaned =
      if (m.edels.isEmpty) base
      else {
        import org.apache.spark.sql.functions.{broadcast, input_file_name, regexp_extract}
        val relCol = regexp_extract(input_file_name(),
          ".*/" + java.util.regex.Pattern.quote(name) + "/(.+)$", 1)
        m.edels.foldLeft(base.withColumn("__rel", relCol)) { (df, e) =>
          val keys = deleteKeys(name, e).select(e.keyPhys.map(col): _*)
          val cond = e.keyPhys.map(k => df(k) === keys(k)).reduce(_ && _) &&
            df("__rel").isInCollection(e.scope)
          df.join(broadcast(keys), cond, "left_anti")
        }.drop("__rel")
      }
    cleaned.select(m.cols.map(c =>
      col(c.physical).cast(c.typeDdl).as(c.logical)): _*)
  }

  /** vault-as-SQL surface over the skipping scan: every registered view's
    * WHERE clause prunes files through [[sqlScan]]'s FileIndex */
  override def registerViews(prefix: String = ""): Unit =
    tables.foreach(n => sqlScan(n).createOrReplaceTempView(prefix + n))

  // ---- S9: metadata-only DDL (rehash_single_hub.sql:17-26,51-69) ---------
  // Each commits a new manifest and touches ZERO data files: logical names
  // map onto immutable physical names, so a rename is a header edit, an
  // added column null-fills older files through the typed mapping, and a
  // dropped column's bytes become invisible (and reclaimable by a later
  // rewrite). The reference needs warehouse ALTER TABLE for these — here
  // they are O(1) regardless of table size.

  private def alterMapping(name: String, op: String)
                          (f: Seq[ColMap] => Seq[ColMap]): Unit = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val m = metaOf(name, v)
    require(m.cols.nonEmpty, s"TxLogTable $name: $op needs a mapped table " +
      "(legacy unmapped manifest — overwrite once to initialize the mapping)")
    val next = f(m.cols)
    // stats are keyed by physical name (rename-proof); entries for columns
    // no longer mapped (drops) fall away with the mapping
    val phys = next.map(_.physical).toSet
    // equality deletes carry through DDL untouched: they anti-join on
    // PHYSICAL names inside the scoped files, which no mapping change
    // moves (a renamed or even dropped key column still kills its rows).
    // Blooms (physical-keyed, rename-proof like stats) and CHECK
    // constraints survive too — constraints reference LOGICAL names, so
    // renaming/dropping a constrained column leaves a constraint later
    // appends fail loudly on (drop it first); silently shedding the
    // contract on every DDL would be worse.
    val withStats = Meta(next,
      m.statsCols.filter(phys),
      m.stats.filter { case ((_, c), _) => phys(c) }, m.txns, m.edels,
      m.bloomCols.filter { case (c, _) => phys(c) },
      m.blooms.filter { case ((_, c), _) => phys(c) },
      m.checks)
    if (!tryCommit(name, v + 1, renderM(withStats, files(name, v))))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on $op — retry")
  }

  /** ALTER TABLE ADD COLUMN (typed NULL for all existing rows). The
    * physical name is version-qualified so a dropped-then-readded logical
    * name can never resurrect stale bytes from old files. */
  def addColumn(name: String, colName: String, typeDdl: String): Unit =
    alterMapping(name, "addColumn") { cols =>
      require(!cols.exists(_.logical == colName),
        s"TxLogTable $name: column $colName already exists")
      val phys = s"${colName}__v${currentVersion(name).get + 1}"
      cols :+ ColMap(phys, colName, typeDdl)
    }

  /** ALTER TABLE RENAME COLUMN — manifest-only. */
  def renameColumn(name: String, from: String, to: String): Unit =
    alterMapping(name, "renameColumn") { cols =>
      require(cols.exists(_.logical == from),
        s"TxLogTable $name: no column $from")
      require(!cols.exists(_.logical == to),
        s"TxLogTable $name: column $to already exists")
      cols.map(c => if (c.logical == from) c.copy(logical = to) else c)
    }

  /** ALTER TABLE DROP COLUMN — manifest-only; bytes become invisible. */
  def dropColumn(name: String, colName: String): Unit =
    alterMapping(name, "dropColumn") { cols =>
      require(cols.exists(_.logical == colName),
        s"TxLogTable $name: no column $colName")
      cols.filterNot(_.logical == colName)
    }

  /** OPTIMIZE — bin-pack small files into `targetFiles` outputs (the
    * lakehouse answer to the small-file problem an append-per-micro-batch
    * table accumulates). With `clusterBy` the rewrite RANGE-partitions and
    * sorts by those columns (the Z-ORDER/liquid-clustering analogue for a
    * single sort dimension): each output file covers a tight, disjoint key
    * range, which is what turns the per-file min/max stats into real
    * pruning power — a point lookup or a key-ranged MERGE then touches one
    * file instead of all of them. One atomic commit swaps the old files for
    * the compacted ones; rows, schema, and snapshot readers are unchanged.
    * Returns (filesBefore, filesAfter). */
  def compact(name: String, targetFiles: Int = 1,
              clusterBy: Seq[String] = Nil): (Int, Int) = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val live = files(name, v)
    // pending equality deletes always warrant the rewrite (it materializes
    // them), even when the file count is already at target
    if (live.size <= math.max(1, targetFiles) && clusterBy.isEmpty &&
        equalityDeletes(name, v).isEmpty)
      return (live.size, live.size)
    val m = metaOf(name, v)
    // the rewrite MATERIALIZES pending equality deletes (tombstoned rows
    // are dropped from the new files) — so the new meta clears them
    val all = readWithDeletes(name, m.cols, live, m.edels)
    val compacted =
      if (clusterBy.isEmpty) all.repartition(math.max(1, targetFiles))
      else all.repartitionByRange(math.max(1, targetFiles), clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    val added = writeBatch(name, compacted, m.cols)
    val withStats = m.copy(stats = m.stats ++ batchStats(name, added, m.statsCols),
      blooms = rebuiltBlooms(name, m, added), edels = Nil)
    if (!tryCommit(name, v + 1, renderM(withStats, added)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on compact — retry")
    (live.size, added.size)
  }

  /** OPTIMIZE ZORDER — multi-dimensional clustering rewrite (Delta's
    * `OPTIMIZE ... ZORDER BY` analog). `compact(clusterBy)` sorts
    * lexicographically, so per-file ranges are tight on the LEADING
    * column only and probes on any other dimension scan every file. Here
    * each clustered column is scaled to a 16-bit bucket over its observed
    * [min, max] (one aggregate pass) and the bucket bits are INTERLEAVED
    * into a z-value; range-partitioning + sorting by z gives every
    * dimension locality — the space-filling curve's quadrant property —
    * which per-file min/max stats turn into pruning on ANY clustered
    * column. Columns must cast order-preservingly to DOUBLE (ints,
    * floats, decimals, timestamps); NULLs share a partition. Materializes
    * pending equality deletes like compact. Returns (before, after). */
  def compactZOrder(name: String, targetFiles: Int,
                    zorderBy: Seq[String]): (Int, Int) = {
    require(zorderBy.nonEmpty && zorderBy.size <= 4,
      s"compactZOrder: 1-4 z-order columns, got ${zorderBy.size}")
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val live = files(name, v)
    val m = metaOf(name, v)
    val all = readWithDeletes(name, m.cols, live, m.edels)
    // shared deterministic z-layout core (graft.ops.ZCluster) — also
    // behind DeltaWrite.optimize; `all eq compacted` means empty table:
    // nothing to cluster, a rewrite would only churn the manifest
    val compacted = graft.ops.ZCluster.layout(all, zorderBy, targetFiles)
    if (compacted eq all) return (live.size, live.size)
    val added = writeBatch(name, compacted, m.cols)
    val withStats = m.copy(
      stats = m.stats ++ batchStats(name, added, m.statsCols),
      blooms = rebuiltBlooms(name, m, added), edels = Nil)
    if (!tryCommit(name, v + 1, renderM(withStats, added)))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on compactZOrder — retry")
    (live.size, added.size)
  }

  /** Drop versions older than the newest `retainVersions`, delete data
    * files no retained manifest references, and reclaim ORPHANED batches —
    * directories written by an aborted overwrite/merge/rewrite (or a
    * DDL-raced append) whose commit never landed. Orphans are only removed
    * once older than `orphanGraceMs`, so a concurrent writer's
    * just-written, not-yet-committed batch survives a racing vacuum (the
    * same retention-window contract Delta's VACUUM carries). Readers of
    * retained versions stay valid — that is the horizon contract. */
  def vacuum(name: String, retainVersions: Int = 2,
             orphanGraceMs: Long = 24L * 3600 * 1000): Unit = {
    val vs = versions(name)
    val (expired, retained) = vs.splitAt(math.max(0, vs.size - math.max(1, retainVersions)))
    // retained manifests pin their data files AND their equality-delete
    // key files — an in-horizon reader needs both to reconstruct rows
    val keep = retained.flatMap(v => files(name, v) ++
      equalityDeletes(name, v).map(_.file)).toSet
    // batches whose expired files THIS pass deletes: deleting a child
    // bumps the dir's mtime to "now", so the grace check below would
    // see the dir as freshly modified and skip it (leaving .crc
    // leftovers to block the empty-dir delete — a flake at millisecond
    // granularity). These dirs are KNOWN garbage once unreferenced;
    // reclaim them regardless of mtime.
    val emptiedBatches = scala.collection.mutable.Set[String]()
    expired.foreach { v =>
      (files(name, v) ++ equalityDeletes(name, v).map(_.file))
        .filterNot(keep).foreach { f =>
          Files.deleteIfExists(root(name).resolve(f)): Unit
          emptiedBatches += f.split('/').head
        }
      Files.deleteIfExists(manifestPath(name, v)): Unit
    }
    val referencedBatches = keep.map(_.split('/').head)
    val cutoff = System.currentTimeMillis() - math.max(0L, orphanGraceMs)
    def rmTree(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val c = Files.list(p)
        try c.iterator().asScala.toSeq.foreach(rmTree) finally c.close()
      }
      Files.deleteIfExists(p): Unit
    }
    val s = Files.list(root(name))
    try s.iterator().asScala.toSeq
      .filter(d => Files.isDirectory(d) &&
        (d.getFileName.toString.startsWith("d-") ||
          d.getFileName.toString.startsWith("ed-")))
      .foreach { d =>
        val batch = d.getFileName.toString
        val isOrphan = !referencedBatches(batch) &&
          (emptiedBatches(batch) ||
            Files.getLastModifiedTime(d).toMillis < cutoff)
        if (isOrphan) rmTree(d)
        // referenced-but-emptied dirs: plain delete succeeds only when empty
        else try Files.delete(d) catch { case _: java.io.IOException => () }
      }
    finally s.close()
  }
}

object TxLogTable {
  /** One logical column of a table. `physical` is the IMMUTABLE name the
    * column carries inside data files (Delta's column-mapping idea): a
    * rename touches only the manifest, and a re-added name never collides
    * with a dropped column's stale bytes because added columns get
    * version-qualified physical names. `typeDdl` is the Catalyst
    * catalogString, used to type NULLs for files that predate the column. */
  final case class ColMap(physical: String, logical: String, typeDdl: String)

  /** One equality-delete (merge-on-read) tombstone file: `file` holds the
    * deleted keys under PHYSICAL column names `keyPhys`; it applies only
    * to the data files in `scope` (those live when the delete committed),
    * so later appends can re-insert a key visibly. */
  final case class EqDelete(file: String, keyPhys: Seq[String], scope: Set[String])
}
