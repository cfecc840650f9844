package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-feed between two snapshots of one table — the diff a
  * downstream consumer reads instead of re-scanning the full table
  * (Delta's CDF / Iceberg's changelog expose the same contract; here it
  * is computed from any two `TxLogTable.readVersion` frames, so it works
  * retroactively on tables that never recorded per-commit change files).
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * hash-partition by key, value compare is a codegen'd null-safe
  * conjunction, unchanged rows are dropped before anything is
  * materialized. No window, no collect; at 100 TB this is the same cost
  * as the MERGE that produced the new snapshot.
  *
  * Reference behavior: datavault4dbt tracks change rows via hashdiff
  * compare inside each satellite load (macros/tables/databricks/sat_v0.sql);
  * this utility generalizes that old-vs-new row diff to whole-table grain.
  */
object Cdc {

  /** Diff `newDf` against `oldDf` on `keys`. Both frames must share the
    * schema (same value columns). Returns one row per changed key:
    * `op` ∈ 'I' (key only in new), 'D' (key only in old), 'U' (present in
    * both with any value column differing — NULL-safe, so value↔NULL
    * transitions count); unchanged keys are dropped. Value columns are
    * emitted as `old_<c>` / `new_<c>` pairs.
    */
  /** Apply a change feed produced by [[diff]] to the old snapshot,
    * reconstructing the new one: D keys drop, U keys take their `new_*`
    * image, I rows insert. `apply(old, diff(old, new), keys) == new` —
    * the patch law CdcSpec pins on random tables; it is what lets a
    * downstream replica follow the feed instead of re-copying snapshots. */
  def apply(oldDf: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = oldDf.columns.filterNot(keys.contains).toSeq
    val touched = changes.select(keys.map(col): _*)
    val kept = oldDf.join(touched, keys, "left_anti")
    val upserts = changes.filter(col("op") =!= "D")
      .select(keys.map(col) ++ valCols.map(c => col(s"new_$c").as(c)): _*)
    kept.unionByName(upserts)
  }

  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(newDf.columns.filterNot(keys.contains).toSeq == valCols,
      s"schema mismatch: old=${oldDf.columns.mkString(",")} new=${newDf.columns.mkString(",")}")
    val o = oldDf.select(keys.map(col) ++ valCols.map(c => col(c).as(s"old_$c"))
      :+ lit(true).as("__in_old"): _*)
    val n = newDf.select(keys.map(col) ++ valCols.map(c => col(c).as(s"new_$c"))
      :+ lit(true).as("__in_new"): _*)
    val joined = o.join(n, keys, "full_outer")
    val changed =
      if (valCols.isEmpty) lit(false)
      else valCols.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    joined
      .withColumn("op",
        when(col("__in_old").isNull, "I")
          .when(col("__in_new").isNull, "D")
          .otherwise("U"))
      .filter(col("op") =!= "U" || changed)
      .select((col("op") +: keys.map(col)) ++
        valCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
