package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the bounded top-k aggregate: ascending (ord, payload)
  * order with deterministic ties, k-capping across partial/merge paths,
  * null skipping, and equality with the window row_number() definition
  * on random data. */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window row_number definition on random-ish data") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 20000, 1, 16)
      .select(($"id" % 37).as("g"), (($"id" * 48271) % 1000).as("ord"),
        $"id".as("payload"))
    val viaWindow = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("ord"), col("payload"))))
      .filter($"rn" <= 7)
      .select($"g", $"rn".cast("long").as("rn"), $"ord", $"payload")
    val viaAgg = df.groupBy($"g")
      .agg(TopKPairs.topKPairs(struct($"ord", $"payload"), 7).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1L).as("rn"), $"col.ord".as("ord"),
        $"col.payload".as("payload"))
    assert(viaWindow.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaWindow).isEmpty)
  }

  test("groups smaller than k return all rows; nulls are skipped") {
    val df = Seq((1L, Some(5L), 10L), (1L, None, 11L), (2L, Some(1L), 12L))
      .toDF("g", "ord", "payload")
    val out = df.groupBy($"g")
      .agg(TopKPairs.topKPairs(struct($"ord", $"payload"), 3).as("top"))
      .select($"g", size($"top").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 1), "null ord must be skipped")
  }

  test("partial aggregation engages: the plan has a partial top_k_pairs step") {
    val df = spark.range(0, 1000).select(($"id" % 3).as("g"), $"id".as("o"), $"id".as("p"))
    val plan = df.groupBy($"g")
      .agg(TopKPairs.topKPairs(struct($"o", $"p"), 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_pairs") || plan.contains("top_k_pairs"),
      s"expected the aggregate in the plan:\n$plan")
    assert("(?i)objecthashaggregate|sortaggregate".r.findFirstIn(plan.toLowerCase).nonEmpty)
  }
}
