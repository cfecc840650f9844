package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{DeltaRead, DeltaWrite}

/** Scale smoke for the MERGE write path (sf10 lineitem-derived table,
  * 15M orders): a key-bounded 1%-ish source must (a) stats-prune most
  * commits' files before any scan, (b) rewrite ONLY the exactly-touched
  * files, (c) keep driver state O(touched file paths). Prints [merge-
  * smoke] lines; run with target/sf10 populated (tools/gen_sf.py). */
object MergeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val tbl = java.nio.file.Files.createTempDirectory("merge_scale")
      .resolve("ord").toString
    val o = spark.read.parquet("target/sf10/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    // 8 key-range-clustered commits — the append-mostly shape whose
    // add.stats let a bounded-key merge touch only the relevant tail
    val maxKey = o.agg(max(col("o_orderkey"))).head().getLong(0)
    val step = maxKey / 8L + 1L
    (0L until 8L).foreach(i => DeltaWrite.write(
      o.filter(col("o_orderkey") >= i * step &&
        col("o_orderkey") < (i + 1) * step), tbl))
    val t1 = System.nanoTime()
    val filesBefore = DeltaRead.snapshot(tbl).files.size
    println(f"[merge-smoke] build ${(t1 - t0) / 1e9}%.1f s, files=$filesBefore")

    // source: every 100th key of ONE octile (bounded) + new keys past max
    val src = o.filter(col("o_orderkey") % 100 === 0 &&
        col("o_orderkey") < step)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .unionByName(o.filter(col("o_orderkey") % 1000 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + maxKey + 1L))
    val srcRows = src.count()
    val t2 = System.nanoTime()
    DeltaWrite.merge(spark, tbl, src, Seq("o_orderkey"))
    val t3 = System.nanoTime()
    val snap = DeltaRead.snapshot(tbl)
    val survivors = snap.files.size
    println(f"[merge-smoke] merge ${(t3 - t2) / 1e9}%.1f s, src_rows=$srcRows, " +
      f"files_after=$survivors")
    val n = DeltaRead.read(spark, tbl).count()
    val updated = DeltaRead.read(spark, tbl)
      .filter(col("o_orderkey") % 100 === 0 && col("o_orderkey") < step &&
        col("o_orderkey") <= maxKey).count()
    val t4 = System.nanoTime()
    println(f"[merge-smoke] read-after ${(t4 - t3) / 1e9}%.1f s, rows=$n")
    val inserted = src.filter(col("o_orderkey") > maxKey).count()
    assert(n == o.count() + inserted, s"row accounting: $n")
    println(s"[merge-smoke] updated_keys=$updated inserted=$inserted OK")
    spark.stop()
  }
}
