package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.{HashConfig, Hashing}
import graft.loaders.{EntitySource, HubLoader}

/** Plan-shape regression tests: the scale claims the loaders make (SURVEY
  * §4) asserted against the ACTUAL physical plans — a refactor that
  * silently breaks predicate pushdown or column pruning fails here, not on
  * a 100 TB cluster. */
class PlanSpec extends SparkSpec {
  implicit val hc: HashConfig = HashConfig()
  import spark.implicits._

  private def writeSrc(): String = {
    val dir = Files.createTempDirectory("graft_plan").toString
    (1 to 100).map(i => (s"k$i", s"p$i",
      java.sql.Timestamp.valueOf(s"2024-01-0${i % 3 + 1} 00:00:00")))
      .toDF("bk", "payload", "ldts")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("HWM filter pushes down into the parquet scan") {
    val dir = writeSrc()
    val src = spark.read.parquet(dir)
      .withColumn("rsrc", lit("SRC"))
      .withColumn("hk", Hashing.hashkey(Seq($"bk")))
    val target = src.filter($"ldts" <= "2024-01-01 23:00:00")
      .select("hk", "bk", "ldts", "rsrc").localCheckpoint()
    val recs = HubLoader.records(Seq(EntitySource(src, Some("hk"), Seq("bk"))),
      "hk", Seq("bk"), target = Some(target))
    val plan = recs.queryExecution.executedPlan.toString
    // the driver-collected HWM must reach the scan as a pushed filter, so
    // parquet row groups below the watermark are skipped at the source
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(ldts.*"),
      s"expected a GreaterThan(ldts, …) pushed filter in:\n$plan")
  }

  test("projection prunes the parquet read schema to the used columns") {
    val dir = writeSrc()
    val src = spark.read.parquet(dir)
      .withColumn("rsrc", lit("SRC"))
      .withColumn("hk", Hashing.hashkey(Seq($"bk")))
    val recs = HubLoader.records(Seq(EntitySource(src, Some("hk"), Seq("bk"))),
      "hk", Seq("bk"), target = None)
    val plan = recs.queryExecution.executedPlan.toString
    // hub loads never touch `payload` — a scan reading it would ship every
    // satellite column through the load at scale
    assert(!plan.contains("payload"),
      s"hub load must not read unused source columns:\n$plan")
  }

  test("contamination-style broadcast join keeps the corpus side shuffle-free") {
    val dir = writeSrc()
    val corpus = spark.read.parquet(dir)
    val smallSet = corpus.limit(5).select($"bk").localCheckpoint()
    val joined = corpus.join(broadcast(smallSet), Seq("bk"), "left_semi")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must not sort-merge against a broadcastable set:\n$plan")
  }

  test("bloom prune: fact table is scanned exactly once") {
    val sfDir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("bloom_join_prune")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    val nOrderScans = "orders\\.parquet".r.findAllIn(plan).size
    // the single-pass audit: one orders scan feeds probe + flags + agg;
    // a second scan would mean the pass_bloom/true-match stats recompute
    // the pipeline (the 8.7s shape this query replaced)
    assert(nOrderScans == 1,
      s"expected exactly one orders scan, found $nOrderScans:\n$plan")
  }

  test("asof join: one shuffle per side, no range-join blow-up operators") {
    val sfDir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("asof_join_events")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"as-of must stay union+window, never a loop join:\n$plan")
    // union + one window: at most the two scan-side exchanges
    val nExch = "ShuffleExchange".r.findAllIn(plan).size
    assert(nExch <= 2, s"expected <=2 exchanges, found $nExch:\n$plan")
  }
}
