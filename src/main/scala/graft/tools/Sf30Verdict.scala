package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-side verdicts for the two sf30 rows whose DuckDB oracles are
  * disk-starved at that scale (VERDICT r12 "give the 2 sf30 oracle skips
  * a verdict path"):
  *
  *  1. `lsh_incremental` family — the chain's ground truth is the
  *     INCREMENTAL ≡ ONE-SHOT identity: accumulating the corpus through
  *     3 [[graft.ops.IncrementalLsh.ingest]] batches (with a mid-stream
  *     clustered compaction) must yield EXACTLY the candidate set of a
  *     single-batch build. Both sides run in Spark; equality is two
  *     exceptAll counts. This is the same invariant `lsh_maintain` pins
  *     against DuckDB at the SFs the oracle can reach.
  *
  *  2. `kcore_peel` — the query's contract is "the peel state after
  *     PeelRounds rounds", which the small-SF oracles pin exactly. At
  *     sf30 this tool proves the stronger statement the oracle can't:
  *     the state is a FIXPOINT (one more round changes nothing) and
  *     satisfies the defining core property (every surviving node's
  *     within-core degree ≥ k) — together these identify the true
  *     k-core independent of round count.
  *
  * Prints one JSON line; every boolean must be true for a PASS verdict. */
object Sf30Verdict {

  private val PeelRounds = 8
  private val CoreK = 3

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.storageFraction", "0.05")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- 1. incremental ≡ one-shot over the LSH maintenance chain ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def wh(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"sf30v_$tag")
      d.toString
    }
    val t0 = System.nanoTime()
    val inc = new graft.runtime.TxLogTable(spark, wh("inc"))
    (0L until 3L).foreach { i =>
      graft.ops.IncrementalLsh.ingest(inc, "docs",
        docs.filter(pmod(col("doc_id"), lit(3L)) === lit(i)), batchId = i)
      if (i == 1L) graft.ops.IncrementalLsh.optimize(inc, "docs")
    }
    val accumulated = graft.ops.IncrementalLsh.candidates(inc, "docs")
    val one = new graft.runtime.TxLogTable(spark, wh("one"))
    graft.ops.IncrementalLsh.ingest(one, "docs", docs, batchId = 0L)
    val oneShot = graft.ops.IncrementalLsh.candidates(one, "docs")
    val accOnly = accumulated.exceptAll(oneShot).count()
    val oneOnly = oneShot.exceptAll(accumulated).count()
    val pairCount = accumulated.count()
    val lshSecs = (System.nanoTime() - t0) / 1e9

    // ---- 2. kcore: fixpoint + core property at sf30 -------------------
    val t1 = System.nanoTime()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = li.join(b, Seq("l_orderkey"))
      .filter(col("l_partkey") < col("pb"))
      .groupBy(col("l_partkey").as("pa"), col("pb"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select("pa", "pb")
    val edges = e0.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint()
    def peelOnce(alive: DataFrame): DataFrame = edges
      .join(alive.select(col("node").as("src")), Seq("src"), "leftsemi")
      .join(alive.select(col("node").as("dst")), Seq("dst"), "leftsemi")
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= CoreK).select("node")
    var alive = edges.select(col("src").as("node")).distinct().localCheckpoint()
    for (_ <- 1 to PeelRounds) alive = peelOnce(alive).localCheckpoint()
    val coreSize = alive.count()
    // fixpoint: one MORE round removes nothing
    val extra = peelOnce(alive).localCheckpoint()
    val fixpoint = extra.count() == coreSize &&
      alive.exceptAll(extra).isEmpty
    // core property: every survivor keeps ≥ k neighbors inside the core
    val minDeg = edges
      .join(alive.select(col("node").as("src")), Seq("src"), "leftsemi")
      .join(alive.select(col("node").as("dst")), Seq("dst"), "leftsemi")
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .agg(min(col("deg"))).head().getLong(0)
    val kcoreSecs = (System.nanoTime() - t1) / 1e9

    println(s"""{"lsh_incremental_eq_oneshot":${accOnly == 0 && oneOnly == 0},""" +
      s""""lsh_pairs":$pairCount,"lsh_acc_only":$accOnly,"lsh_one_only":$oneOnly,""" +
      s""""lsh_secs":${f"$lshSecs%.1f"},""" +
      s""""kcore_fixpoint":$fixpoint,"kcore_size":$coreSize,""" +
      s""""kcore_min_in_core_degree":$minDeg,"kcore_property_ok":${minDeg >= CoreK},""" +
      s""""kcore_secs":${f"$kcoreSecs%.1f"}}""")
    spark.stop()
  }
}
