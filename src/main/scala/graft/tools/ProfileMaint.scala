package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expr.Hashing

/** Phase-level wall-clock profile of the maintenance drills
  * (txlog_pit_cleanup / vault_forget shapes) — adjudicates whether a
  * bench regression lives in the Spark plans or in the commit path.
  * Usage: runMain graft.tools.ProfileMaint <sfDir>. */
object ProfileMaint {
  implicit val hc: graft.expr.HashConfig = graft.expr.HashConfig()
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warmup: JIT + parquet reader init outside the measurement
    spark.read.parquet(s"$dir/customer.parquet").count(): Unit

    (1 to 2).foreach { pass =>
      println(s"[profile] ---- pass $pass ----")
      val wh = java.nio.file.Files.createTempDirectory("graft_prof").toString
      val t = new graft.runtime.TxLogTable(spark, wh)
      val hk = spark.read.parquet(s"$dir/customer.parquet")
        .select(Hashing.hashkey(Seq(col("c_custkey"))).as("hk_customer_h"))
      Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach { d =>
        timed(s"append pit $d") {
          t.append("pit", hk.withColumn("sdts", lit(d).cast("timestamp")))
        }
      }
      timed("overwrite snap") {
        t.overwrite("snap", spark.sql(
          """SELECT timestamp'2024-01-01' AS sdts, true AS is_active
            |UNION ALL SELECT timestamp'2024-01-02', false
            |UNION ALL SELECT timestamp'2024-01-03', true""".stripMargin))
      }
      timed("cleanUp") {
        graft.runtime.TxPitCleaner.cleanUp(t, "pit", "snap")
      }
      timed("read back") { t.read("pit").count() }
    }
    spark.stop()
  }
}
