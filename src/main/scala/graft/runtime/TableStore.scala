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
}
