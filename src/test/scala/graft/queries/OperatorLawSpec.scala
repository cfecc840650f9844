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

  test("spearman ranks: bucketed two-level prefix sum equals rank() + tie " +
    "midpoint on adversarial synthetic data") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // values straddle bucket boundaries (4095/4096/4097), repeat heavily,
    // and include 0 — every seam of the bucket decomposition
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      val seg = s"s${i % 3}"
      val v: Long = rng.nextInt(10) match {
        case 0 => 4095L + rng.nextInt(3)      // boundary straddle
        case 1 => 0L                          // min edge
        case 2 => 8192L                       // exact 2nd boundary
        case _ => rng.nextInt(20000).toLong   // bulk
      }
      (seg, v)
    }
    val df = rows.toDF("seg", "x")
    // naive definition: rank() + (ties - 1) / 2, windowed per seg over RAW
    // rows — correct at any size, degenerate at scale (|seg| partitions)
    val naive = df.withColumn("r",
        rank().over(Window.partitionBy("seg").orderBy("x")) +
          (count(lit(1)).over(Window.partitionBy("seg", "x")) - 1) / 2.0)
      .select("seg", "x", "r").distinct()
    // distributed definition: the spearman_corr two-level prefix sum
    val W = 4096L
    val cnts = df.groupBy(col("seg"), col("x")).agg(count(lit(1)).as("cnt"))
      .withColumn("b", floor(col("x") / W))
    val wwin = Window.partitionBy("seg", "b").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, 0)
    val bwin = Window.partitionBy("seg").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = cnts.groupBy("seg", "b").agg(sum("cnt").as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(bwin), lit(0L)))
      .select("seg", "b", "boff")
    val bucketed = cnts.withColumn("wcum", sum(col("cnt")).over(wwin))
      .join(boff, Seq("seg", "b"))
      .select(col("seg"), col("x"),
        (col("boff") + col("wcum") - col("cnt") + (col("cnt") + 1) / 2.0).as("r"))
    assert(naive.except(bucketed).isEmpty && bucketed.except(naive).isEmpty)
    // rank sum invariant: sum of avg ranks per seg = n(n+1)/2
    val per = bucketed.join(df.groupBy("seg", "x").count(), Seq("seg", "x"))
      .groupBy("seg").agg(sum(col("r") * col("count")).as("srk"),
        sum("count").as("n")).collect()
    per.foreach { row =>
      val n = row.getAs[Long]("n").toDouble
      assert(math.abs(row.getAs[Double]("srk") - n * (n + 1) / 2.0) < 1e-6)
    }
  }

  test("winnow fingerprints: in-array formulation equals the windowed " +
    "definition and honors the shared-substring guarantee") {
    import spark.implicits._
    val k = 5; val w = 8
    // short doc (< k), doc with exactly one window, and two docs sharing
    // a 12-char substring (w + k - 1 — the winnowing guarantee threshold)
    val shared = "quick brown fox!"
    val docsDf = Seq(
      (0L, "abc"),                                 // below k: no grams
      (1L, "abcdefghijkl"),                        // exactly one window
      (2L, s"XX $shared YY padding padding more"),
      (3L, s"zz $shared qq other tail here too")).toDF("doc_id", "text")
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val base = docsDf.select(col("doc_id"), substring(norm, 1, 200).as("t"))
      .filter(length(col("t")) >= k)
    // the let-binding shape the query uses: transform(array(<hs>), ...)
    // evaluates the gram-hash array ONCE per row (a projected column
    // would be inlined into every lambda reference by Catalyst)
    val inArray = base.select(col("doc_id"), explode(expr(
      s"""transform(array(transform(sequence(1, length(t) - ${k - 1}), i -> md5(substr(t, i, $k)))),
         |  hs -> IF(size(hs) >= $w,
         |           array_distinct(transform(sequence(1, size(hs) - ${w - 1}), j -> array_min(slice(hs, j, $w)))),
         |           cast(array() AS array<string>)))[0]""".stripMargin)).as("fp"))
    // reference: the exploded + windowed definition
    import org.apache.spark.sql.expressions.Window
    val grams = base.withColumn("__n", length(col("t")) - (k - 1))
      .select(col("doc_id"), col("__n"),
        explode(expr(s"transform(sequence(1, length(t) - ${k - 1}), i -> struct(i AS i, substr(t, i, $k) AS g))")).as("e"))
      .select(col("doc_id"), col("__n"), col("e.i").as("i"), md5(col("e.g")).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    val windowed = grams.withColumn("fp", min(col("h")).over(win))
      .filter(col("i") <= col("__n") - (w - 1))
      .select(col("doc_id"), col("fp")).distinct()
    assert(inArray.except(windowed).isEmpty && windowed.except(inArray).isEmpty)
    // guarantee: docs 2 and 3 share a substring of length >= w + k - 1,
    // so they must share at least one fingerprint
    val f2 = inArray.filter(col("doc_id") === 2).select("fp")
    val f3 = inArray.filter(col("doc_id") === 3).select("fp")
    assert(f2.intersect(f3).count() >= 1)
    // doc 0 emits nothing; doc 1 emits exactly one fingerprint
    assert(inArray.filter(col("doc_id") === 0).count() === 0)
    assert(inArray.filter(col("doc_id") === 1).count() === 1)
  }
}
