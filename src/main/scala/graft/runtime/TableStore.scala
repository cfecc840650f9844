package graft.runtime

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The materialization contract the [[Runner]] schedules against — dbt's
  * {is_incremental(), {{ this }}, full-refresh} protocol, implemented by
  * the plain-parquet [[TableStore]] and the transactional [[TxLogTable]].
  */
trait VaultStore {
  def baseDir: String
  def exists(name: String): Boolean
  def read(name: String): DataFrame
  def readIfExists(name: String): Option[DataFrame]
  /** incremental insert (S6) */
  def append(name: String, df: DataFrame): Unit
  /** table materialization / full refresh (S5) */
  def overwrite(name: String, df: DataFrame): Unit

  /** Table names present in the warehouse (directories that pass the
    * [[exists]] probe). */
  def tables: Seq[String] = {
    val base = Paths.get(baseDir)
    if (!Files.isDirectory(base)) Nil
    else {
      val s = Files.list(base)
      try {
        val it = s.filter(f => Files.isDirectory(f)).iterator()
        val buf = Seq.newBuilder[String]
        while (it.hasNext) buf += it.next().getFileName.toString
        buf.result().filter(exists).sorted
      } finally s.close()
    }
  }

  /** Register every warehouse table as a session temp view (optionally
    * prefixed) — the dbt-user surface: vault entities are tables you
    * SELECT from, so the whole vault becomes queryable from plain
    * `spark.sql`. Views are lazy scans; registration reads no data. */
  def registerViews(prefix: String = ""): Unit =
    tables.foreach(n => read(n).createOrReplaceTempView(prefix + n))
}

/** Incremental materialization protocol over a Parquet warehouse directory —
  * the Spark-side equivalent of dbt's {is_incremental(), {{ this }},
  * full-refresh} contract that every reference macro leans on
  * (e.g. `macros/tables/databricks/hub.sql:44,165-179`).
  *
  * On a real cluster the base path is object storage and the format would be
  * Delta/Iceberg; the protocol (exists-check → append-only delta loads) is
  * identical. Loads are insert-only by Data Vault design, so plain Parquet
  * appends are transactionally sufficient here.
  */
final class TableStore(val spark: SparkSession, val baseDir: String) extends VaultStore {

  def pathOf(name: String): String = s"$baseDir/$name"

  /** dbt `is_incremental()` ⇔ target exists (reference `hub.sql:44`).
    * A partitioned table's data files live one level down in `pcol=value`
    * directories — probe those too, or a partitioned target would silently
    * full-refresh on every load. */
  def exists(name: String): Boolean = {
    val p = Paths.get(pathOf(name))
    def hasParquet(dir: java.nio.file.Path): Boolean = {
      val s = Files.list(dir)
      try s.anyMatch(f => f.toString.endsWith(".parquet"))
      finally s.close()
    }
    def partitionDirs(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = Files.list(dir)
      try {
        val it = s.filter(f =>
          Files.isDirectory(f) && f.getFileName.toString.contains("=")).iterator()
        val buf = Seq.newBuilder[java.nio.file.Path]
        while (it.hasNext) buf += it.next()
        buf.result()
      } finally s.close()
    }
    Files.isDirectory(p) && (hasParquet(p) || partitionDirs(p).exists(hasParquet))
  }

  /** dbt `{{ this }}` — the current target contents. */
  def read(name: String): DataFrame = spark.read.parquet(pathOf(name))

  def readIfExists(name: String): Option[DataFrame] =
    if (exists(name)) Some(read(name)) else None

  /** Incremental insert (S6): append `records_to_insert`. */
  def append(name: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(pathOf(name))

  /** Table materialization / full refresh (S5). */
  def overwrite(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(pathOf(name))

  def drop(name: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(pathOf(name)))
  }

  /** S7/S8 emulation without a transactional format: read-modify-overwrite.
    * (With Delta/Iceberg on a cluster this is MERGE/DELETE.)
    * The transformed result streams straight into a sibling tmp directory —
    * the source files stay intact until the write commits, so no cache /
    * pre-materialization pass is needed; the swap is the commit point. */
  def rewrite(name: String)(f: DataFrame => DataFrame): Unit = {
    val tmp = pathOf(name) + "__rewrite_tmp"
    f(read(name)).write.mode("overwrite").parquet(tmp)
    drop(name)
    Files.move(Paths.get(tmp), Paths.get(pathOf(name)))
  }

  // ---- partition-aware maintenance (S7/S8 at O(delta), not O(table)) -----
  // Hive-style `pcol=value` directories make DELETE a metadata operation
  // (drop directories) and rewrite partition-pruned — the parquet-store
  // analogue of Delta's partition-level MERGE/DELETE/replaceWhere.

  /** Partitioned materialization: one directory per `pcol` value. */
  def overwritePartitioned(name: String, df: DataFrame, pcol: String): Unit =
    df.write.mode("overwrite").partitionBy(pcol).parquet(pathOf(name))

  /** Partitioned incremental insert. */
  def appendPartitioned(name: String, df: DataFrame, pcol: String): Unit =
    df.write.mode("append").partitionBy(pcol).parquet(pathOf(name))

  /** Hive-escaped partition values present on disk (decoded). */
  def partitionValues(name: String, pcol: String): Seq[String] = {
    val dir = new java.io.File(pathOf(name))
    val prefix = pcol + "="
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(f => unescapePathName(f.getName.stripPrefix(prefix)))
  }

  /** S7 — copy-on-write MERGE at O(affected partitions), the parquet-store
    * analogue of Delta's partition-pruned `MERGE INTO` (reference
    * `rehash_single_hub.sql:84-111` runs MERGE row-level; on a partitioned
    * lake a MERGE rewrites only the files whose partitions hold matched
    * keys). Semantics: rows of `name` whose `keyCols` match a `source` row
    * are REPLACED by it; unmatched `source` rows are INSERTED. Only the
    * `pcol` partitions present in `source` are read or rewritten — every
    * other partition directory is untouched on disk.
    *
    * CONTRACT (the same one Delta's partition-constrained MERGE /
    * `replaceWhere` carries): a matched key's EXISTING row must live in the
    * same partition as its replacement. That holds whenever `pcol` is a
    * stable function of the key, and whenever the delta's rows were read
    * from this table itself (targeted rehash does exactly that). A key
    * relocating across partitions inserts the new row without deleting the
    * old one — a full-scan MERGE is the tool for that case, not this one.
    *
    * The merged result is fully materialized into a sibling tmp directory
    * BEFORE any target file is deleted (crash-safe: a failure mid-write
    * leaves the target intact; a failure mid-swap leaves recoverable
    * per-partition tmp output). Spark writes the tmp tree with the same
    * Hive `pcol=value` escaping as the target, so the swap matches
    * directories by name — no value re-formatting.
    */
  def mergePartitioned(name: String, pcol: String, source: DataFrame,
                       keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    // affected partitions: O(load dates / snapshots) values — a driver-side
    // list here is partition METADATA, not data (same class as dbt's
    // compile-time run_query probes), and buys static partition pruning on
    // the target scan below
    val affected = source.select(col(pcol)).distinct().collect().map(_.get(0))
    val pruned = read(name).filter(col(pcol).isInCollection(affected))
    val keep = pruned.join(
      source.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val merged = keep.unionByName(source.select(pruned.columns.map(col).toIndexedSeq: _*))
    val tmp = pathOf(name) + "__merge_tmp"
    merged.write.mode("overwrite").partitionBy(pcol).parquet(tmp)
    // swap only the partition dirs the merge produced
    val prefix = pcol + "="
    val tmpDir = new java.io.File(tmp)
    val tgtDir = new java.io.File(pathOf(name))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    Option(tmpDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .foreach { pdir =>
        val dst = new java.io.File(tgtDir, pdir.getName)
        if (dst.exists()) rm(dst)
        Files.move(pdir.toPath, dst.toPath): Unit
      }
    rm(tmpDir)
  }

  /** S8 — partition-level DELETE: removes whole `pcol=value` directories.
    * O(deleted partitions); no surviving file is read or rewritten. */
  def dropPartitions(name: String, pcol: String, values: Seq[String]): Long = {
    val doomed = values.toSet
    val dir = new java.io.File(pathOf(name))
    val prefix = pcol + "="
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(prefix) &&
        doomed.contains(unescapePathName(f.getName.stripPrefix(prefix))))
      .map { f => rm(f); 1L }
      .sum
  }

  // ---- bucketed tables (co-located joins at scale) ----------------------
  // Hash-bucketing a satellite/hub by its hashkey and sorting by ldts makes
  // every (hashkey, hashkey) join and every ldts window SHUFFLE-FREE when
  // both sides share the layout: the sort-merge join reads co-located
  // buckets directly (no Exchange in the plan). This is the Spark-native
  // equivalent of the reference warehouses' cluster/distribution keys, and
  // the layout a 100 TB vault should use for its big entities. Bucket
  // metadata lives in the session catalog (external table at our path).

  /** Create/replace a bucketed, sort-ordered materialization.
    * Writes to a sibling tmp table FIRST and swaps after full
    * materialization: `df` may be derived from the table being replaced
    * (the old drop-then-lazy-write lost the input), and a mid-write crash
    * must leave either the old or the new table, never neither. */
  def overwriteBucketed(name: String, df: DataFrame, bucketCol: String,
                        nBuckets: Int, sortCol: String): Unit = {
    val tmpName = name + "__bucket_tmp"
    spark.sql(s"DROP TABLE IF EXISTS `$tmpName`")
    drop(tmpName)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(sortCol)
      .option("path", pathOf(tmpName))
      .saveAsTable(tmpName)
    val schemaDdl = spark.table(tmpName).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    drop(name)
    Files.move(Paths.get(pathOf(tmpName)), Paths.get(pathOf(name)))
    spark.sql(s"DROP TABLE IF EXISTS `$tmpName`") // external: files already moved
    spark.sql(
      s"""CREATE TABLE `$name` ($schemaDdl) USING PARQUET
         |CLUSTERED BY (`$bucketCol`) SORTED BY (`$sortCol`) INTO $nBuckets BUCKETS
         |LOCATION '${pathOf(name)}'""".stripMargin)
  }

  /** Append a delta preserving the bucket layout. */
  def appendBucketed(name: String, df: DataFrame, bucketCol: String,
                     nBuckets: Int, sortCol: String): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(sortCol)
      .option("path", pathOf(name))
      .saveAsTable(name)

  /** Read WITH bucket metadata (path reads can't carry it). */
  def readTable(name: String): DataFrame = spark.table(name)

  /** inverse of Spark's ExternalCatalogUtils.escapePathName. Consecutive
    * %XX escapes are one UTF-8 byte EACH (a non-ASCII char escapes to
    * several) — collect them into a byte run and decode as UTF-8, not as
    * one char per escape. */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    val run = new java.io.ByteArrayOutputStream
    def flushRun(): Unit = if (run.size > 0) {
      sb.append(new String(run.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      run.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        run.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { flushRun(); sb.append(c); i += 1 }
    }
    flushRun()
    sb.toString
  }
}
