package graft.runtime

import org.apache.spark.sql.functions._

import graft.expr.{HashConfig, Hashing}

/** Maintenance operations (SURVEY §2.1 S7/S8/S9 + §3.3).
  *
  * The reference implements rehashing as an imperative ALTER TABLE /
  * MERGE / RENAME script per entity
  * (`macros/rehashing/single_entities/databricks/rehash_single_hub.sql`).
  * On a transactional format this is DeltaTable.merge + ALTER TABLE; on the
  * parquet store it is a read-modify-overwrite with the same row-level
  * semantics: every row's hash columns are recomputed from the business
  * keys, EXCEPT ghost records, which keep their zero/error keys
  * (`rehash_single_hub.sql:84-111` — the MERGE's WHEN MATCHED guards on the
  * ghost keys).
  */
object Rehasher {

  /** Recompute `hashCol` from `keyColumns` across an entire entity
    * (e.g. after switching hash algorithm MD5 → SHA256). */
  def rehashEntity(store: TableStore, table: String, hashCol: String,
                   keyColumns: Seq[String], oldCfg: HashConfig, newCfg: HashConfig): Unit =
    store.rewrite(table) { df =>
      val ghost = col(hashCol) === oldCfg.zeroKey || col(hashCol) === oldCfg.errorKey
      val ghostValue = when(col(hashCol) === oldCfg.zeroKey, lit(newCfg.zeroKey))
        .otherwise(lit(newCfg.errorKey))
      df.withColumn(hashCol,
        when(ghost, ghostValue)
          .otherwise(Hashing.hashkey(keyColumns.map(col))(newCfg)))
    }

  /** S9 — rename a column (reference ALTER TABLE ... RENAME COLUMN,
    * `rehashing/internal_overwrites/get_rename_column_sql.sql`). */
  def renameColumn(store: TableStore, table: String, from: String, to: String): Unit =
    store.rewrite(table)(_.withColumnRenamed(from, to))

  /** S9 — add a typed column (reference alter_table_add_col.sql). */
  def addColumn(store: TableStore, table: String, name: String, dtype: String): Unit =
    store.rewrite(table)(_.withColumn(name, lit(null).cast(dtype)))

  /** S9 — drop columns. */
  def dropColumns(store: TableStore, table: String, names: String*): Unit =
    store.rewrite(table)(_.drop(names: _*))
}

/** S8 — PIT cleanup: delete PIT rows whose snapshot was deactivated in the
  * snapshot control table (reference `macros/hooks/clean_up_pits.sql:128-136`
  * — `DELETE FROM pit WHERE sdts NOT IN (SELECT sdts FROM snap WHERE
  * is_active)`). Keeps PIT size O(active snapshots) = O(log t) under the
  * logarithmic retention logic. */
object PitCleaner {
  def cleanUp(store: TableStore, pitTable: String, snapshotTable: String,
              sdts: String = "sdts", trigger: String = "is_active"): Long = {
    val active = store.read(snapshotTable).filter(col(trigger)).select(sdts)
    var kept = 0L
    store.rewrite(pitTable) { pit =>
      val keep = pit.join(active, Seq(sdts), "left_semi")
      kept = keep.count()
      keep
    }
    kept
  }

  /** Partition-pruned variant for a PIT stored `partitionBy(sdts)`: the
    * DELETE drops whole `sdts=` directories — O(deactivated snapshots), no
    * surviving row read or rewritten. This is the layout PITs should use at
    * scale: every maintenance op (cleanup, snapshot rebuild) is keyed by
    * sdts, and the snapshot count is O(log t) under logarithmic retention.
    * Returns the number of partitions dropped. */
  def cleanUpPartitioned(store: TableStore, pitTable: String, snapshotTable: String,
                         sdts: String = "sdts", trigger: String = "is_active"): Long = {
    import org.apache.spark.sql.functions.col
    val active = store.read(snapshotTable).filter(col(trigger))
      .select(col(sdts).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val doomed = store.partitionValues(pitTable, sdts).filterNot(active.contains)
    store.dropPartitions(pitTable, sdts, doomed)
  }
}
