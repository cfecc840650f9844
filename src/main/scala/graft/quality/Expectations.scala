package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic data-quality expectations as DATA (the Great-Expectations /
  * dbt-tests shape, generalized beyond the vault-specific
  * [[VaultConstraints]]): each expectation compiles to a conditional
  * count inside ONE aggregate pass over the table — N rules cost one
  * scan, not N — except `Unique`, which needs its own bounded
  * group-count pass per column set.
  */
object Expectations {

  sealed trait Rule { def name: String }
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null:$column"
  }
  /** expression must hold on every row (range checks, regex, custom) */
  final case class Holds(name: String, predicate: String) extends Rule
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    val name = s"accepted_values:$column"
  }
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique:${columns.mkString("+")}"
  }

  private def violation(r: Rule): Option[Column] = r match {
    case NotNull(c)           => Some(col(c).isNull)
    case Holds(_, p)          => Some(!coalesce(expr(p), lit(false)))
    case AcceptedValues(c, v) => Some(!col(c).isin(v.map(lit): _*))
    case Unique(_)            => None
  }

  /** Evaluate all rules; returns (rule, n_rows, n_violations, passed) —
    * one row per rule, deterministic order-independent counts. */
  def report(table: DataFrame, rules: Seq[Rule]): DataFrame = {
    val scanRules = rules.filter(violation(_).isDefined)
    val uniqueRules = rules.collect { case u: Unique => u }
    val spark = table.sparkSession
    import spark.implicits._

    val scan: Seq[(String, Long, Long)] =
      if (scanRules.isEmpty) Nil
      else {
        val aggs = count(lit(1)).as("__n") +: scanRules.map(r =>
          sum(when(violation(r).get, 1L).otherwise(0L)).as(r.name))
        val row = table.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getLong(0)
        scanRules.zipWithIndex.map { case (r, i) =>
          (r.name, n, row.getLong(i + 1))
        }
      }
    val uniq: Seq[(String, Long, Long)] = uniqueRules.map { u =>
      val dups = table.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
        .agg(coalesce(sum(col("__c")), lit(0L))).head().getLong(0)
      (u.name, table.count(), dups)
    }
    (scan ++ uniq)
      .toDF("rule", "n_rows", "n_violations")
      .withColumn("passed", col("n_violations") === 0L)
  }
}
