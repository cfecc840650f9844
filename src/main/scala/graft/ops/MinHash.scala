package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared MinHash+LSH signature scheme: word-3-gram shingles, one
  * 30-bit md5-derived base hash per shingle, 8 universal-hash minhashes
  * ((a·u + b) mod p), 2 bands × 4 rows. Batch candidate generation
  * (`graft.queries.TextQueries`) computes the mins with an
  * explode + codegen'd min-aggregate (the fast shape on Spark — measured
  * faster than per-row array folds, which fall off codegen); the streaming
  * operator (`StreamingLoaders.lshCandidatesStream`) uses the per-row fold
  * because stateful streaming cannot chain an aggregation before
  * flatMapGroupsWithState. Both produce IDENTICAL signatures.
  */
object MinHash {

  /** word-3-gram shingles as an array column; the CASE guards against
    * sequence(1, 0) which would generate a DESCENDING range */
  val shinglesExpr: String =
    "CASE WHEN size(words) < 3 THEN array() " +
      "ELSE transform(sequence(1, size(words) - 2), " +
      "i -> concat_ws(' ', slice(words, i, 3))) END"

  /** a_j < 2^24 and u < 2^30 keep every product inside a signed 64-bit long */
  val HashFamily: Seq[(Long, Long)] = Seq(
    (1299721L, 11L), (2750159L, 103L), (4256233L, 1009L), (5800079L, 10007L),
    (7368787L, 100003L), (8960453L, 1000003L), (10570841L, 233L), (12195257L, 377L))
  val HashPrime: Long = 1073741789L // largest prime < 2^30

  /** per-row signature over a `shs` (shingle array) column — for streaming;
    * batch uses the explode+min-agg shape instead (see object doc) */
  def perRowSig: Column = {
    val us = "transform(shs, x -> " +
      "cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint) % 1073741824L)"
    concat_ws("|", HashFamily.map { case (a, b) =>
      expr(s"array_min(transform($us, u -> ($a * u + $b) % $HashPrime))")
        .cast("string")
    }: _*)
  }

  /** LSH band bucket id; expects columns named `band` and `sig` */
  def bucketExpr: Column =
    md5(concat(col("band").cast("string"), lit("#"),
      expr("concat_ws('|', slice(split(sig, '\\\\|'), band * 4 + 1, 4))")))

  /** Batch-shape signatures: one row `(idCol, sig)` per document that has
    * at least one shingle. 30-bit base hash = top 15 hex digits of ONE md5
    * per distinct shingle, then all 8 minhashes in ONE aggregation over the
    * un-replicated shingle rows (8 parallel codegen'd min columns) — the
    * j-explode variant multiplied shuffle volume 8× for identical bytes.
    * Shared by the one-shot corpus chain (`graft.queries.TextQueries`) and
    * the incremental maintenance operator ([[IncrementalLsh]]), so both
    * provably bucket by the same signature. */
  def signatures(docsDf: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val sh = docsDf
      .withColumn("words", split(col(textCol), "\\s+"))
      .select(col(idCol), explode(array_distinct(expr(shinglesExpr))).as("shingle"))
      .select(col(idCol),
        (conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long")
          % 1073741824L).as("u"))
    sh.groupBy(idCol)
      .agg(concat_ws("|", HashFamily.map { case (a, b) =>
        min((lit(a) * col("u") + lit(b)) % lit(HashPrime)).cast("string")
      }: _*).as("sig"))
  }

  /** `(idCol, band, bucket)` rows from a signature frame — 2 bands × 4 rows */
  def bands(sig: DataFrame, idCol: String = "doc_id"): DataFrame =
    sig.select(col(idCol), explode(array(lit(0), lit(1))).as("band"), col("sig"))
      .select(col(idCol), col("band"), bucketExpr.as("bucket"))
}
