package graft

import org.apache.spark.sql.functions._

/** Completeness of the prefix-filter set-similarity join
  * (`setsim_prefix_join`, TextQueries).
  *
  * The oracle row proves engine parity, but both engines share the
  * prefix-filter candidate scheme, so parity alone can't prove the
  * prefix is EXHAUSTIVE for the threshold (both could drop the same
  * pair). This pins the full pipeline against an O(n²) brute force at
  * sf0.001 (≤50 docs → ≤1.2k pairs), using the query's own integer
  * decision rule (10·|∩| ≥ 7·|∪|) so the comparison is exact.
  */
class PrefixFilterSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("setsim_prefix_join matches all-pairs brute force exactly") {
    val got = SparkEntry.queries("setsim_prefix_join")(spark, sfDir)
      .select("doc_id", "doc_id_2", "n_inter", "n_union").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap

    // brute force: same tokenization, every pair, no prefix filter
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 500)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= 3)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (id, ts) => id -> ts.map(_._2).toSet }

    val brute = (for {
      (a, sa) <- toks.toSeq
      (b, sb) <- toks.toSeq if a < b
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * 10 >= union * 7
    } yield ((a, b), (inter, union))).toMap

    assert(brute.nonEmpty, "fixture produced no similar pairs")
    assert(got == brute,
      s"missing=${(brute.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- brute.keySet).take(5)}")
  }
}
