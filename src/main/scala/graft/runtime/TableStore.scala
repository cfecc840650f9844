package graft.runtime

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

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
final class TableStore(val spark: SparkSession, val baseDir: String) {

  def pathOf(name: String): String = s"$baseDir/$name"

  /** dbt `is_incremental()` ⇔ target exists (reference `hub.sql:44`). */
  def exists(name: String): Boolean = {
    val p = Paths.get(pathOf(name))
    Files.isDirectory(p) && Files.list(p).anyMatch(f => f.toString.endsWith(".parquet"))
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
    * (With Delta/Iceberg on a cluster this is MERGE/DELETE.) */
  def rewrite(name: String)(f: DataFrame => DataFrame): Unit = {
    val cur = read(name).cache()
    val next = f(cur).cache()
    next.count() // force materialization before the overwrite clobbers input
    val tmp = pathOf(name) + "__rewrite_tmp"
    next.write.mode("overwrite").parquet(tmp)
    cur.unpersist()
    next.unpersist()
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

  /** Create/replace a bucketed, sort-ordered materialization. */
  def overwriteBucketed(name: String, df: DataFrame, bucketCol: String,
                        nBuckets: Int, sortCol: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    drop(name)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(sortCol)
      .option("path", pathOf(name))
      .saveAsTable(name)
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

  /** inverse of Spark's ExternalCatalogUtils.escapePathName (%XX escapes) */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
