package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `theta_overlap` and `hll_sketch_rollup` oracles compare sketch-
  * derived booleans against DuckDB constants, which is only sound if the
  * estimates are DETERMINISTIC — a pure function of the input SET,
  * independent of partitioning and merge order. That holds by construction
  * (theta keeps the k smallest hash values; HLL keeps per-register maxima;
  * both are commutative-idempotent merges), but nothing in the API
  * contract says so: this spec pins it against Spark's implementation, so
  * an upgrade that broke it fails here instead of flaking the driver gate.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val n = 5000
  private def data(parts: Int) =
    (1 to n).map(i => (s"v${i % 1700}", i % 7)).toDF("v", "g").repartition(parts)

  test("theta estimates are invariant under partitioning and merge order") {
    val ests = Seq(1, 3, 17, 64).map { p =>
      data(p).agg(expr("theta_sketch_estimate(theta_sketch_agg(v))").as("e"))
        .as[Long].head()
    }
    assert(ests.distinct.size == 1, s"partitioning changed the estimate: $ests")
    // set semantics: duplicating every row changes nothing
    val doubled = data(5).union(data(9))
      .agg(expr("theta_sketch_estimate(theta_sketch_agg(v))").as("e"))
      .as[Long].head()
    assert(doubled == ests.head, "theta must be insensitive to multiplicity")
  }

  test("theta set algebra matches exact set operations on dense inputs") {
    // below the sketch's nominal capacity (lgK=12 ⇒ 4096) estimates are
    // exact — intersection/union/difference must equal the true counts
    val a = (1 to 2000).map(i => s"k$i").toDF("v")
    val b = (1501 to 3500).map(i => s"k$i").toDF("v")
    val ska = a.agg(expr("theta_sketch_agg(v)").as("sk")).as("x")
    val skb = b.agg(expr("theta_sketch_agg(v)").as("sk")).as("y")
    val r = ska.crossJoin(skb).select(
      expr("theta_sketch_estimate(theta_intersection(x.sk, y.sk))").as("i"),
      expr("theta_sketch_estimate(theta_union(x.sk, y.sk))").as("u"),
      expr("theta_sketch_estimate(theta_difference(x.sk, y.sk))").as("d"))
      .as[(Long, Long, Long)].head()
    assert(r == ((500L, 3500L, 1500L)), s"got $r")
  }

  test("hll union of partial sketches equals the one-shot sketch estimate") {
    val d = data(8)
    val oneShot = d.agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 12))"))
      .as[Long].head()
    val rolled = d.groupBy("g").agg(expr("hll_sketch_agg(v, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .as[Long].head()
    assert(rolled == oneShot,
      s"grouped-then-unioned ($rolled) must equal one-shot ($oneShot)")
    val exact = 1700L
    assert(math.abs(oneShot - exact).toDouble <= 0.05 * exact,
      s"estimate $oneShot outside 5% of $exact")
  }

  test("kll below capacity: quantiles exact, partition/merge-order invariant") {
    // kll_quantile_rollup relies on this: KLL compaction is randomized, so
    // its oracle is only deterministic while every sketch retains all
    // items — which k=2048 guarantees at the verified scales. Pin that a
    // below-capacity sketch (a) returns a true data item at the exact
    // inclusive rank, (b) is invariant under partitioning, and (c) a merge
    // of grouped below-capacity sketches equals the one-shot sketch.
    val vals = (1 to 1000).map(i => (i.toLong * 3, i % 7))
    def q(parts: Int) =
      vals.toDF("v", "g").repartition(parts)
        .agg(expr("kll_sketch_get_quantile_bigint(kll_sketch_agg_bigint(v, 2048), 0.5)"))
        .as[Long].head()
    val qs = Seq(1, 4, 32).map(q)
    assert(qs.distinct.size == 1, s"partitioning changed the quantile: $qs")
    assert(qs.head == 1500L, s"p50 of 3..3000 step 3 must be 1500, got ${qs.head}")
    // kll_sketch_merge_bigint is a two-sketch scalar, so the rollup folds
    // over the collected group sketches; below capacity the merged sketch
    // holds the full multiset union, so the fold order cannot matter
    val merged = vals.toDF("v", "g").groupBy("g")
      .agg(expr("kll_sketch_agg_bigint(v, 2048)").as("sk"))
      .agg(collect_list(col("sk")).as("ls"))
      .select(expr("kll_sketch_get_quantile_bigint(" +
        "aggregate(slice(ls, 2, size(ls) - 1), ls[0], " +
        "(a, x) -> kll_sketch_merge_bigint(a, x)), 0.5)"))
      .as[Long].head()
    assert(merged == qs.head,
      s"grouped-then-merged ($merged) must equal one-shot (${qs.head})")
  }
}
