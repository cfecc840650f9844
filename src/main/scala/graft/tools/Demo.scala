package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expr.{HashConfig, SystemColumns}
import graft.loaders._
import graft.runtime.TableStore

/** End-to-end drive of the core pipeline over real test data:
  * stage(customer) → hub → sat v0 → sat v1, two incremental batches,
  * idempotence check. `sbt "runMain graft.tools.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    implicit val hc: HashConfig = HashConfig()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = java.nio.file.Files.createTempDirectory("graft_demo_wh").toString
    val store = new TableStore(spark, wh)
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")

    // batch t: half the customers on day 1, all on day 2 (acctbal drifts)
    def batch(day: Int) = {
      val src = if (day == 1) customer.filter(col("c_custkey") % 2 === 0) else customer
      src.withColumn("c_acctbal", col("c_acctbal") + lit(day - 1) * 10.0)
    }

    val stageCfg = StageConfig(
      ldts = "!IGNORED", rsrc = "!TPC_H/Customer",
      hashedColumns = Seq(
        HashColumnSpec("hk_customer_h", Seq("c_custkey")),
        HashColumnSpec("hd_customer_s", Seq("c_name", "c_acctbal", "c_mktsegment"), isHashdiff = true)),
      enableGhostRecords = true)

    Seq(1, 2).foreach { day =>
      val isInc = store.exists("customer_h")
      val staged = StageLoader.build(batch(day),
        stageCfg.copy(ldts = s"!2024-01-0$day 00:00:00"), isIncremental = isInc)

      val hubRecs = HubLoader.records(
        Seq(EntitySource(staged, Some("hk_customer_h"), Seq("c_custkey"))),
        "hk_customer_h", Seq("c_custkey"), store.readIfExists("customer_h"))
      store.append("customer_h", hubRecs)

      val satRecs = SatV0Loader.records(staged, Seq("hk_customer_h"),
        Some("hd_customer_s"), Seq("c_name", "c_acctbal", "c_mktsegment"),
        store.readIfExists("customer_s0"))
      store.append("customer_s0", satRecs)
      println(s"[demo] day $day: hub+=${hubRecs.count()} sat+=${satRecs.count()}")
    }

    // idempotence: replay batch 2 → zero new rows
    val staged2 = StageLoader.build(batch(2), stageCfg.copy(ldts = "!2024-01-02 00:00:00"),
      isIncremental = true)
    val hubAgain = HubLoader.records(
      Seq(EntitySource(staged2, Some("hk_customer_h"), Seq("c_custkey"))),
      "hk_customer_h", Seq("c_custkey"), store.readIfExists("customer_h")).count()
    val satAgain = SatV0Loader.records(staged2, Seq("hk_customer_h"),
      Some("hd_customer_s"), Seq("c_name", "c_acctbal", "c_mktsegment"),
      store.readIfExists("customer_s0")).count()
    println(s"[demo] replay day 2: hub+=$hubAgain sat+=$satAgain (want 0, 0)")

    val v1 = SatV1Loader.build(store.read("customer_s0"), "hk_customer_h",
      Some("hd_customer_s"), addIsCurrentFlag = true)
    println(s"[demo] sat v1 rows=${v1.count()} current=${v1.filter(col("is_current")).count()}")
    v1.orderBy("hk_customer_h", "ldts").show(6, truncate = false)

    val nCust = customer.count()
    val hub = store.read("customer_h")
    println(s"[demo] customers=$nCust hub=${hub.count()} (hub == customers + 2 ghosts?)")

    // the same hub on the TRANSACTIONAL format: versioned appends, a
    // file-pruned MERGE, time travel back to v1, and an O(1) metadata DDL
    val tx = new graft.runtime.TxLogTable(spark, wh + "_tx")
    tx.append("customer_h", hub.filter(col(SystemColumns.LdtsAlias) <= "2024-01-01 12:00:00"))
    tx.append("customer_h", hub.filter(col(SystemColumns.LdtsAlias) > "2024-01-01 12:00:00"))
    val preMergeCount = tx.read("customer_h").count()
    tx.merge("customer_h",
      tx.read("customer_h").limit(5).withColumn(SystemColumns.RsrcAlias, lit("TPC_H/Customer/fix")),
      Seq("hk_customer_h"))
    tx.addColumn("customer_h", "loaded_by", "string")
    val v1Count = tx.readVersion("customer_h", 1).count()
    println(s"[demo] txlog: versions=${tx.versions("customer_h").size} rows=${tx.read("customer_h").count()} " +
      s"(want $preMergeCount) v1=$v1Count merged_rsrc=${tx.read("customer_h").filter(col(SystemColumns.RsrcAlias) === "TPC_H/Customer/fix").count()} (want 5)")
    spark.stop()
  }
}
