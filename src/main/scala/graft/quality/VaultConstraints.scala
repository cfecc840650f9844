package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's documented per-entity correctness contract
  * (`docs/26_general-usage-notes/40_testing-a-data-vault/40_testing-a-data-vault.md:47-71`)
  * as executable checks — the dbt generic tests (`not_null`, `unique`,
  * `relationships`) a datavault4dbt project attaches to every entity.
  *
  * Every check returns ONE DataFrame row (check name, violation count) and
  * aggregates fully distributed — counting violations is a groupBy/join,
  * never a driver-side scan — so the whole battery over a 100 TB vault is
  * a handful of shuffles. `report` unions a battery into a single result
  * for scheduling as one job.
  */
object VaultConstraints {

  private def asRow(check: String, cnt: DataFrame): DataFrame =
    cnt.select(lit(check).as("check"), col("violations").cast("long").as("violations"))

  /** violation count: rows with a NULL in any of `cols` */
  def notNullViolations(df: DataFrame, cols: Seq[String], check: String): DataFrame =
    asRow(check, df.select(coalesce(
      sum(when(cols.map(c => col(c).isNull).reduce(_ || _), 1L).otherwise(0L)),
      lit(0L)).as("violations")))

  /** violation count: duplicated key VALUES, NULL keys excluded — dbt's
    * generic `unique` test filters `where column is not null` and returns
    * one failing row per duplicated value (NULL completeness is
    * `not_null`'s job, reported separately) */
  def uniqueViolations(df: DataFrame, cols: Seq[String], check: String): DataFrame =
    asRow(check, df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
      .select(coalesce(sum(when(col("__n") > 1, 1L).otherwise(0L)), lit(0L))
        .as("violations")))

  /** violation count: child rows whose key has no parent row (dbt
    * `relationships`); NULL child keys are not orphans (dbt semantics) */
  def subsetViolations(child: DataFrame, childCol: String,
                       parent: DataFrame, parentCol: String,
                       check: String): DataFrame =
    asRow(check, child.select(col(childCol))
      .filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
      .agg(count(lit(1)).as("violations")))

  /** hub / link / nh-link: hashkey not_null + unique */
  def keyedEntityChecks(entity: DataFrame, hashkey: String,
                        prefix: String): Seq[DataFrame] = Seq(
    notNullViolations(entity, Seq(hashkey), s"$prefix.${hashkey}_not_null"),
    uniqueViolations(entity, Seq(hashkey), s"$prefix.${hashkey}_unique"))

  /** satellite v0: (hk, ldts) unique, hk not_null, hk ⊆ parent */
  def satV0Checks(sat: DataFrame, hashkey: String, ldts: String,
                  parent: DataFrame, parentHashkey: String,
                  prefix: String): Seq[DataFrame] = Seq(
    notNullViolations(sat, Seq(hashkey), s"$prefix.${hashkey}_not_null"),
    uniqueViolations(sat, Seq(hashkey, ldts), s"$prefix.hk_ldts_unique"),
    subsetViolations(sat, hashkey, parent, parentHashkey, s"$prefix.fk_in_parent"))

  /** multi-active satellite v0: (hk, ldts, maKeys*) unique + subset */
  def maSatChecks(sat: DataFrame, hashkey: String, ldts: String,
                  maKeys: Seq[String], parent: DataFrame, parentHashkey: String,
                  prefix: String): Seq[DataFrame] = Seq(
    notNullViolations(sat, Seq(hashkey), s"$prefix.${hashkey}_not_null"),
    uniqueViolations(sat, Seq(hashkey, ldts) ++ maKeys, s"$prefix.hk_ldts_ma_unique"),
    subsetViolations(sat, hashkey, parent, parentHashkey, s"$prefix.fk_in_parent"))

  /** link FKs each reference their hub */
  def linkFkChecks(link: DataFrame, fks: Seq[(String, DataFrame, String)],
                   prefix: String): Seq[DataFrame] =
    fks.map { case (fkCol, hub, hubHk) =>
      subsetViolations(link, fkCol, hub, hubHk, s"$prefix.${fkCol}_in_hub")
    }

  /** one result set for a whole battery */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
