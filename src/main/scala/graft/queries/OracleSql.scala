package graft.queries

/** Emits DuckDB-dialect SQL implementing the exact hash semantics of
  * `graft.expr.Hashing` (reference `hash_standardization.sql:549-612`), so
  * the driver's DuckDB oracle can reproduce every hash byte-for-byte.
  *
  * DuckDB dialect notes (vs Spark SQL):
  *  - string concat must use `||` (DuckDB's concat() SKIPS nulls, Spark's
  *    concat() propagates them)
  *  - replace() is literal (no regex) — same as our Column implementation
  */
object OracleSql {
  val ZeroKey: String = "!" + "0" * 32

  /** databricks__attribute_standardise in DuckDB SQL */
  def std(e: String): String =
    raw"""('"' || replace(replace(replace(replace(trim(cast($e as varchar)), '\', '\\'), '"', 'dv4dbt-quote-replacement'), '^^', 'dv4dbt-null-replacement'), '||', 'dv4dbt-concat-replacement') || '"')"""

  def concatStd(cols: Seq[String], caseSensitive: Boolean): String = {
    val parts = cols.map(c => s"coalesce(${std(c)}, '^^')").mkString(" || '||' || ")
    val cased = if (caseSensitive) s"($parts)" else s"upper($parts)"
    val stripped =
      s"replace(replace(replace(replace($cased, chr(10), ''), chr(9), ''), chr(11), ''), chr(13), '')"
    val allNull = cols.map(_ => "^^").mkString("||")
    s"nullif($stripped, '$allNull')"
  }

  def hashkey(cols: String*): String =
    s"coalesce(lower(md5(${concatStd(cols, caseSensitive = false)})), '$ZeroKey')"

  def hashdiff(cols: String*): String =
    s"coalesce(lower(md5(${concatStd(cols, caseSensitive = true)})), '$ZeroKey')"

  /** H4 use_rtrim variant: trailing null-placeholder/concat chars stripped
    * before hashing (hash_standardization.sql:562-568) */
  def hashdiffRtrim(cols: String*): String =
    s"coalesce(lower(md5(rtrim(${concatStd(cols, caseSensitive = true)}, '^|'))), '$ZeroKey')"

  /** SHA256 variants (rehash-target algorithm; zero key = 64 zeros,
    * `hash_default_values.sql:242-259`) */
  val ZeroKeySha256: String = "!" + "0" * 64

  def hashkeySha256(cols: String*): String =
    s"coalesce(lower(sha256(${concatStd(cols, caseSensitive = false)})), '$ZeroKeySha256')"

  def hashdiffSha256(cols: String*): String =
    s"coalesce(lower(sha256(${concatStd(cols, caseSensitive = true)})), '$ZeroKeySha256')"

  /** aggregate expression: ordered LISTAGG + hash (H5). Ordering matches the
    * Spark implementation AND the reference's LISTAGG ... WITHIN GROUP
    * (ORDER BY ma_keys): native-typed ma keys, standardized row as tiebreak. */
  def maHashdiff(payload: Seq[String], maKeys: Seq[String]): String = {
    val row = concatStd(payload, caseSensitive = true)
    val order = (maKeys :+ row).mkString(", ")
    s"coalesce(lower(md5(string_agg($row, ',' ORDER BY $order))), '$ZeroKey')"
  }

  /** SHA256 variant of [[maHashdiff]] — the rehash-target algorithm for MA
    * satellites (grouped set-hashdiff recomputation). */
  def maHashdiffSha256(payload: Seq[String], maKeys: Seq[String]): String = {
    val row = concatStd(payload, caseSensitive = true)
    val order = (maKeys :+ row).mkString(", ")
    s"coalesce(lower(sha256(string_agg($row, ',' ORDER BY $order))), '$ZeroKeySha256')"
  }
}
