package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Vault hashing semantics, re-expressed as pure Catalyst `Column`
  * expressions (whole-stage-codegen friendly — no UDFs).
  *
  * Semantics derived from the reference implementation
  * (ScalefreeCOM/datavault4dbt, Databricks dialect):
  *  - attribute standardization: `macros/supporting/hash_standardization.sql:93-103`
  *  - concatenated standardization (hashkey/hashdiff):
  *    `macros/supporting/hash_standardization.sql:549-612`
  *  - multi-active (grouped, ordered LISTAGG) hashdiff:
  *    `macros/supporting/hash_standardization.sql:1215-1287`
  *  - zero/error keys per algorithm:
  *    `macros/supporting/hash_default_values.sql:234-266`
  *  - config defaults: `dbt_project.yml:17-44`
  */
final case class HashConfig(
    algorithm: String = "MD5", // MD5 | SHA1 | SHA256 | SHA512
    hashDatatype: String = "STRING", // STRING | BINARY (`hash_datatype` var, hash.sql:42,109,177)
    concatString: String = "||",
    quoteCharacter: String = "\"",
    nullPlaceholder: String = "^^",
    concatReplacement: String = "dv4dbt-concat-replacement",
    quoteReplacement: String = "dv4dbt-quote-replacement",
    nullReplacement: String = "dv4dbt-null-replacement",
    hashkeyCaseSensitive: Boolean = false,
    hashdiffCaseSensitive: Boolean = true,
    hashdiffUseTrim: Boolean = true
) {
  private def hexDigits: Int = algorithm match {
    case "MD5"             => 32
    case "SHA" | "SHA1"    => 40
    case "SHA2" | "SHA256" => 64
    case "SHA512"          => 128
    case other => throw new IllegalArgumentException(s"unknown hash algorithm $other")
  }
  private def keyOf(ch: Char): String = "!" + (ch.toString * hexDigits)

  /** BINARY hash columns store the raw digest bytes; zero/error keys become
    * the all-00/all-ff byte constants WITHOUT the '!' sentinel (reference
    * `hash_default_values.sql:49-52` — `TO_BINARY('00…')`/`TO_BINARY('ff…')`). */
  val isBinary: Boolean = hashDatatype.toUpperCase.contains("BINARY")

  /** the DDL type a hash column of this config stores as */
  val typeDdl: String = if (isBinary) "binary" else "string"

  /** all-business-keys-null sentinel (reference: `hash_default_values.sql:242-259`) */
  def zeroKey: String = keyOf('0')
  /** error-ghost-record sentinel */
  def errorKey: String = keyOf('f')
  def zeroKeyBytes: Array[Byte] = Array.fill(hexDigits / 2)(0x00.toByte)
  def errorKeyBytes: Array[Byte] = Array.fill(hexDigits / 2)(0xff.toByte)
  /** the sentinel as a typed literal of the configured hash datatype */
  def zeroKeyLit: Column = if (isBinary) lit(zeroKeyBytes) else lit(zeroKey)
  def errorKeyLit: Column = if (isBinary) lit(errorKeyBytes) else lit(errorKey)

  def hashFn(c: Column): Column = algorithm match {
    case "MD5"             => md5(c)
    case "SHA" | "SHA1"    => sha1(c)
    case "SHA2" | "SHA256" => sha2(c, 256)
    case "SHA512"          => sha2(c, 512)
    case other => throw new IllegalArgumentException(s"unknown hash algorithm $other")
  }

  /** the stored digest: lowercase hex string, or its bytes when BINARY —
    * `unhex` keeps the whole expression inside whole-stage codegen */
  def digest(pre: Column): Column =
    if (isBinary) unhex(hashFn(pre)) else lower(hashFn(pre))
}

object Hashing {

  val Default: HashConfig = HashConfig()

  /** H1 — attribute standardization (reference:
    * `hash_standardization.sql:93-103`, databricks__attribute_standardise):
    * quote-wrap, escape backslashes, replace delimiter collisions. NULL in →
    * NULL out (concat with a NULL is NULL).
    */
  def standardize(c: Column, useTrim: Boolean = true)(implicit cfg: HashConfig): Column = {
    val s0 = if (useTrim) trim(c.cast("string")) else c.cast("string")
    // every replacement here is a LITERAL substitution — use replace() (plain
    // substring scan, codegen'd) instead of regexp_replace (regex engine +
    // per-row Matcher): same bytes, measurably cheaper on wide hashdiffs
    val s1 = replace(s0, lit("\\"), lit("\\\\")) // one backslash -> two
    val s2 = replace(s1, lit(cfg.quoteCharacter), lit(cfg.quoteReplacement))
    val s3 = replace(s2, lit(cfg.nullPlaceholder), lit(cfg.nullReplacement))
    val s4 = replace(s3, lit(cfg.concatString), lit(cfg.concatReplacement))
    concat(lit(cfg.quoteCharacter), s4, lit(cfg.quoteCharacter))
  }

  /** The concatenated, standardized, pre-hash string for a list of columns
    * (reference `hash.sql:71-96` loop + `hash_standardization.sql:549-612`).
    * Returns NULL iff every input column is NULL (NULLIF against [ALL_NULL]).
    */
  def concatenated(cols: Seq[Column], caseSensitive: Boolean, useTrim: Boolean)(
      implicit cfg: HashConfig): Column = {
    require(cols.nonEmpty, "hash over empty column list")
    val parts = cols.map(c => coalesce(standardize(c, useTrim), lit(cfg.nullPlaceholder)))
    val joined = parts.reduce((a, b) => concat(a, lit(cfg.concatString), b))
    val cased = if (caseSensitive) joined else upper(joined)
    // strip \n \t \v \r (reference: hash_standardization.sql:573-577) —
    // literal single-char replaces, no regex needed
    val stripped = replace(
      replace(replace(replace(cased, lit("\n"), lit("")), lit("\t"), lit("")),
        lit("\u000B"), lit("")),
      lit("\r"), lit(""))
    val allNull = cols.map(_ => cfg.nullPlaceholder).mkString(cfg.concatString)
    nullif(stripped.cast("string"), lit(allNull))
  }

  /** H7 — datatype-aware hash-input normalization (reference
    * `get_field_hash_by_datatype.sql:1-29`): BOOLEAN hashes as 1/0
    * (DECODE(col, true, 1, false, 0)), semi-structured/nested values hash as
    * their JSON serialization (SUPER → JSON_SERIALIZE). Everything else keeps
    * the engine's plain string cast. Byte-stable across engines, unlike
    * `cast(bool as string)` ('true' on Spark, 't' on Postgres, …). */
  def normalizeInput(c: Column, dt: DataType): Column = dt match {
    case BooleanType                               => c.cast("int")
    case _: StructType | _: ArrayType | _: MapType => to_json(c)
    case _                                         => c
  }

  /** resolve `names` against the frame's schema (case-insensitively, like
    * every other analyzer-resolved column reference) and H7-normalize each */
  def hashInputs(df: DataFrame, names: Seq[String]): Seq[Column] =
    names.map { n =>
      val field = df.schema.fields.find(_.name == n).getOrElse {
        df.schema.fields.filter(_.name.equalsIgnoreCase(n)) match {
          case Array(one) => one
          case Array()    => throw new IllegalArgumentException(
            s"hash input column '$n' not found among ${df.columns.mkString(", ")}")
          case many       => throw new IllegalArgumentException(
            s"hash input column '$n' is ambiguous: ${many.map(_.name).mkString(", ")}")
        }
      }
      normalizeInput(col(field.name), field.dataType)
    }

  /** H3 — hashkey: case-insensitive by default, always trimmed, all-null →
    * zero key (reference `hash.sql:31-96`, `dbt_project.yml:32`).
    */
  def hashkey(cols: Seq[Column])(implicit cfg: HashConfig): Column = {
    val pre = concatenated(cols, caseSensitive = cfg.hashkeyCaseSensitive, useTrim = true)
    coalesce(cfg.digest(pre), cfg.zeroKeyLit)
  }

  /** H4 — hashdiff: case-sensitive by default, trim configurable, optional
    * RTRIM of trailing null-placeholder/concat chars
    * (reference `hash_standardization.sql:562-568`, `dbt_project.yml:34`).
    */
  def hashdiff(cols: Seq[Column], rtrimHashdiff: Boolean = false)(
      implicit cfg: HashConfig): Column = {
    val pre0 = concatenated(cols, caseSensitive = cfg.hashdiffCaseSensitive, useTrim = cfg.hashdiffUseTrim)
    // databricks RTRIM(trimStr, str): strips trailing chars in the SET
    // {null_placeholder chars ∪ concat chars} — e.g. {'^','|'}
    val pre = if (rtrimHashdiff) rtrim(pre0, cfg.nullPlaceholder + cfg.concatString) else pre0
    coalesce(cfg.digest(pre), cfg.zeroKeyLit)
  }

  /** H5 — multi-active hashdiff: the per-row standardized concat, aggregated
    * as an ordered LISTAGG(',') over the multi-active keys inside one
    * (main_hashkey, ldts) group, then hashed (reference
    * `hash_standardization.sql:1215-1287`; invoked with
    * `GROUP BY main_hashkey, ldts` from `staging/databricks/stage.sql:402-418`).
    *
    * This returns the AGGREGATE expression — apply inside a `groupBy`.
    * Ordering: LISTAGG ... WITHIN GROUP (ORDER BY ma_keys); we additionally
    * order by the standardized string itself so ties are total
    * (SURVEY §7.5-5: determinism).
    *
    * Implementation: [[MaListAgg]], a native TypedImperativeAggregate that
    * sorts the group once and emits the joined string directly (no
    * array-of-structs intermediate); it skips NULL structs, matching
    * LISTAGG's null-skipping, and returns NULL on an empty group.
    */
  def maHashdiff(payloadCols: Seq[Column], maKeys: Seq[Column])(
      implicit cfg: HashConfig): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val rowStr = concatenated(payloadCols, caseSensitive = cfg.hashdiffCaseSensitive,
      useTrim = cfg.hashdiffUseTrim)
    // keep native key types in the sort struct: LISTAGG ... WITHIN GROUP
    // (ORDER BY ma_keys) orders by the key's own type — casting numerics to
    // string would order 10 before 2 and diverge from the reference bytes
    val keyed = maKeys.zipWithIndex.map { case (k, i) => k.as(s"k$i") }
    val entry = when(rowStr.isNotNull, struct((keyed :+ rowStr.as("s")): _*))
    val pre = GraftColumnBridge.column(
      MaListAgg(GraftColumnBridge.expression(entry)).toAggregateExpression())
    coalesce(cfg.digest(pre), cfg.zeroKeyLit)
  }
}
