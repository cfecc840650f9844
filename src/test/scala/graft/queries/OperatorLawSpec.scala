package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws the driver's value-equality oracle can't express: invariants that
  * must hold for ANY input, pinned on the sf0.001 data (and small
  * synthetic frames) for the operators added in round 6.
  */
class OperatorLawSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("asof join: every attached order is at-or-before its event, and " +
    "no later qualifying order exists") {
    val res = q("asof_join_events")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ets"))
    val od = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k2"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("od"))
    val joined = res.join(ev, Seq("event_id"))
      .join(od, res("asof_orderkey") === col("k2"), "left")
    // law 1: the chosen order's date never exceeds the event time
    assert(joined.filter(col("asof_orderkey").isNotNull &&
      col("od") > col("ets")).count() === 0)
    // law 2 (frontier): no other order of the same user lies strictly
    // between the chosen order's date and the event time
    val better = joined.filter(col("asof_orderkey").isNotNull)
      .join(od.select(col("o_custkey").as("c3"), col("od").as("od3")),
        col("user_id") === col("c3") && col("od3") <= col("ets") &&
          col("od3") > col("od"))
    assert(better.count() === 0)
    // law 3: a null attachment means the user truly has no prior order
    val nulls = joined.filter(col("asof_orderkey").isNull)
      .join(od.select(col("o_custkey").as("c4"), col("od").as("od4")),
        col("user_id") === col("c4") && col("od4") <= col("ets"), "leftsemi")
    assert(nulls.count() === 0)
  }

  test("bloom join prune: zero false negatives by construction") {
    val row = q("bloom_join_prune").collect().head
    val nTrue = row.getAs[Long]("n_true_match")
    val nPass = row.getAs[Long]("n_pass_bloom")
    // every true match must have passed the filter — a Bloom filter can
    // over-approximate, never under-approximate
    assert(nPass >= nTrue)
    // and the real join size must equal the true-match count measured
    // through the filter (no matching fact was dropped)
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_acctbal") > 9000.0).select(col("c_custkey"))
    val direct = spark.read.parquet(s"$dir/orders.parquet")
      .join(dim, col("o_custkey") === col("c_custkey"), "leftsemi").count()
    assert(nTrue === direct)
  }

  test("merkle checksum: invariant to row order, sensitive to any value") {
    import spark.implicits._
    def root(df: org.apache.spark.sql.DataFrame): String = {
      val rows = df.select(md5(concat_ws("|", col("a"), col("b"))).as("h"))
      val buckets = rows.groupBy(substring(col("h"), 1, 2).as("bk"))
        .agg(md5(concat_ws("", sort_array(collect_list(col("h"))))).as("d"))
      buckets.agg(md5(concat_ws("",
        sort_array(collect_list(concat(col("bk"), col("d")))))))
        .collect().head.getString(0)
    }
    val base = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("a", "b")
    val shuffled = base.orderBy(md5(col("b")))  // a different physical order
    assert(root(base) === root(shuffled))
    val mutated = base.withColumn("b",
      when(col("a") === 250L, lit("vX")).otherwise(col("b")))
    assert(root(base) !== root(mutated))
  }

  test("typed longest streak: matches brute-force recomputation") {
    val res = q("typed_longest_streak").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val days = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("d"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted.toVector)
    days.foreach { case (u, ds) =>
      var best = 0; var cur = 0; var prev = Int.MinValue
      ds.foreach { d =>
        cur = if (d == prev + 1) cur + 1 else 1
        best = math.max(best, cur); prev = d
      }
      assert(res(u) === ((best, ds.length)), s"user $u")
    }
  }

  test("epoch shuffle: each epoch is a permutation and epochs differ") {
    import graft.queries.{ScaleQueries => _}
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    val res = q("epoch_shuffle").collect()
    assert(res.length === 3)
    res.foreach { r =>
      assert(r.getAs[Long]("n_docs") === docs)
      assert(r.getAs[Long]("n_distinct_docs") === docs)
    }
    // shard assignment must actually vary by epoch (the mix uses e):
    // compare shard-size vectors pairwise — identical vectors for all
    // pairs would mean the epoch input is ignored
    val sizes = res.map(r => (r.getAs[Long]("min_shard"), r.getAs[Long]("max_shard"))).toSet
    assert(sizes.size >= 2 || res.map(_.getAs[Double]("char_imbalance_pct")).toSet.size >= 2)
  }
}
