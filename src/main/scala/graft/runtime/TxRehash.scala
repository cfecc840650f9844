package graft.runtime

import org.apache.spark.sql.functions._

import graft.expr.{HashConfig, Hashing}

/** The reference's single-entity rehash lifecycle
  * (`macros/rehashing/single_entities/databricks/rehash_single_hub.sql`) on
  * the TRANSACTIONAL format — step for step:
  *
  *   1. `ALTER TABLE ADD COLUMN <hk>_updated` (`:17-26`)   → metadata-only
  *   2. `MERGE INTO` computing the new hashes (`:84-111`)  → one file-level
  *      rewrite, atomic, ghost rows keep their zero/error keys
  *   3. keep the old values as `<hk>_deprecated` (`:51-69`) → metadata-only
  *      rename (the recoverability column the reference preserves for
  *      exactly the partial-failure case)
  *   4. the new column takes the hash column's name         → metadata-only
  *
  * Exactly ONE pass reads and rewrites data (step 2); every schema step is
  * an O(1) manifest commit, and each step is individually atomic — a crash
  * between steps leaves a consistent, recoverable table (the old hashes are
  * still present, either under their original name or `_deprecated`).
  */
object TxRehash {

  /** Rehash a keyed entity's hash column from its key columns (hub business
    * keys, or a link's stored FK hashkeys pre-translated by the caller). */
  def rehashEntity(t: TxLogTable, table: String, hashCol: String,
                   keyColumns: Seq[String],
                   oldCfg: HashConfig, newCfg: HashConfig): Unit = {
    val updated = s"${hashCol}_updated"
    val deprecated = s"${hashCol}_deprecated"
    require(!t.read(table).columns.contains(deprecated),
      s"TxRehash: $table.$deprecated already exists — " +
        "finish or roll back the previous rehash first")
    // 1. typed NULL column, no data touched
    t.addColumn(table, updated, "string")
    // 2. the one data pass: every live file rewritten in one atomic commit
    val v = t.currentVersion(table).get
    t.replaceFiles(table, t.files(table, v)) { df =>
      val ghost = col(hashCol) === oldCfg.zeroKey || col(hashCol) === oldCfg.errorKey
      val ghostValue = when(col(hashCol) === oldCfg.zeroKey, lit(newCfg.zeroKey))
        .otherwise(lit(newCfg.errorKey))
      // hashInputs = the same H7 datatype normalization staging applies —
      // a rehash must reproduce what the NEXT stage load will compute
      df.withColumn(updated,
        when(ghost, ghostValue)
          .otherwise(Hashing.hashkey(Hashing.hashInputs(df, keyColumns))(newCfg)))
    }
    // 3./4. old values survive as _deprecated; new column takes the name
    t.renameColumn(table, hashCol, deprecated)
    t.renameColumn(table, updated, hashCol)
  }

  /** Drop the `_deprecated` recovery column once the rehash is validated —
    * the reference's final cleanup step, metadata-only here. */
  def dropDeprecated(t: TxLogTable, table: String, hashCol: String): Unit =
    t.dropColumn(table, s"${hashCol}_deprecated")
}
