package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy-engineering operators beside the k-anonymity audit
  * (RelQueries) and PII scrub (TextQueries):
  *
  *  - DIFFERENTIAL-PRIVACY noisy counts via the GEOMETRIC MECHANISM
  *    (discrete Laplace — the standard integer-count DP mechanism).
  *    Noise must be reproducible across engines for the oracle, so the
  *    uniform draw is a seeded md5 hash of the group key and the
  *    inverse CDF is a 41-entry threshold table COMPUTED ONCE in Scala
  *    and rendered as identical decimal literals into both the Spark
  *    plan and the DuckDB SQL (the zorder_layout bit-term trick) — no
  *    libm call ever runs at query time, so both engines bucket the
  *    same u into the same noise integer. (Seeded-hash noise is a
  *    test-determinism device; production would draw real randomness —
  *    the MECHANISM and its ε accounting are what's exercised.)
  *  - l-DIVERSITY audit: per quasi-identifier group, the count of
  *    distinct sensitive values — k-anonymity's complement (a group can
  *    be large yet expose everyone if all members share the sensitive
  *    value).
  */
object PrivacyQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  private val Epsilon = 0.5
  private val NoiseBound = 20

  /** cumulative thresholds of the two-sided geometric with α = e^-ε,
    * truncated at ±NoiseBound and renormalized: noise = the first k (in
    * -20..20) whose cumulative probability exceeds u. Computed once
    * here; both engines consume the same printed decimal literals. */
  private val cumThresholds: Seq[(Int, String)] = {
    val alpha = math.exp(-Epsilon)
    val ks = -NoiseBound to NoiseBound
    val raw = ks.map(k => math.pow(alpha, math.abs(k)))
    val total = raw.sum
    val cum = raw.scanLeft(0.0)(_ + _).tail.map(_ / total)
    ks.zip(cum).map { case (k, c) => (k, f"$c%.17f") }
  }

  /** uniform in [0,1) from the md5 of the group key + seed: the first
    * 15 hex chars as an integer over 16^15. */
  private def uniformCol(key: Column): Column =
    conv(substring(md5(concat(key.cast("string"), lit("#dpseed1"))), 1, 15),
      16, 10).cast("double") / lit(math.pow(16.0, 15))

  private def uniformSqlDuck(key: String): String =
    s"cast(cast(('0x' || substr(md5(cast($key AS varchar) || '#dpseed1'), 1, 15)) AS UBIGINT) AS double) / ${f"${math.pow(16.0, 15)}%.1f"}"

  /** the CASE chain mapping u → noise, from the shared threshold table. */
  private def noiseCol(u: Column): Column =
    cumThresholds.init.foldRight(lit(NoiseBound): Column) {
      case ((k, c), rest) => when(u < expr(c), lit(k)).otherwise(rest)
    }

  private def noiseSqlDuck(u: String): String =
    "CASE " + cumThresholds.init
      .map { case (k, c) => s"WHEN $u < $c THEN $k" }
      .mkString(" ") + s" ELSE $NoiseBound END"

  val all: Seq[Q] = Seq(

    // ε = 0.5 noisy per-nation customer counts. The published column is
    // noisy_n (true_n rides along only for the oracle pin / utility
    // report); sensitivity of a count is 1, so one geometric draw per
    // group spends exactly ε. Pure projection + one bounded groupBy —
    // the noise CASE chain is 41 codegen'd comparisons against
    // constants.
    Q("dp_noisy_counts",
      (s, dir) => {
        val grouped = rd(s, dir, "customer")
          .groupBy(col("c_nationkey").cast("long").as("nation"))
          .agg(count(lit(1)).as("true_n"))
        val u = uniformCol(col("nation"))
        grouped
          .withColumn("noise", noiseCol(u).cast("long"))
          .select(col("nation"), col("true_n"),
            (col("true_n") + col("noise")).as("noisy_n"),
            col("noise"), lit(Epsilon).as("epsilon"))
      },
      Some(s"""WITH g AS (
              |  SELECT cast(c_nationkey AS BIGINT) AS nation,
              |    cast(count(*) AS BIGINT) AS true_n
              |  FROM customer GROUP BY 1),
              |n AS (
              |  SELECT nation, true_n,
              |    cast(${noiseSqlDuck(uniformSqlDuck("nation"))} AS BIGINT)
              |      AS noise
              |  FROM g)
              |SELECT nation, true_n, true_n + noise AS noisy_n, noise,
              |  $Epsilon AS epsilon
              |FROM n""".stripMargin)),

    // l-diversity: distinct sensitive values (market segment) per
    // quasi-identifier group (nation × balance-thousand band), flagging
    // groups below l = 3 — the groups where k-anonymity alone would
    // still leak the sensitive attribute. Two-phase distinct count, one
    // shuffle on the QI key.
    Q("l_diversity",
      (s, dir) => {
        rd(s, dir, "customer")
          .groupBy(col("c_nationkey").cast("long").as("nation"),
            floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
          .agg(count(lit(1)).as("group_size"),
            countDistinct(col("c_mktsegment")).as("l"))
          .withColumn("diverse", col("l") >= 3)
      },
      Some("""SELECT cast(c_nationkey AS BIGINT) AS nation,
             |  cast(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             |  cast(count(*) AS BIGINT) AS group_size,
             |  cast(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
             |  count(DISTINCT c_mktsegment) >= 3 AS diverse
             |FROM customer GROUP BY 1, 2""".stripMargin))
  )
}
