package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{DeltaRead, DeltaWrite}
object DvScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val tbl = java.nio.file.Files.createTempDirectory("dv_scale").resolve("li").toString
    // SPARK_GRAFT_DV_FILES=n spreads the table over n files — the
    // high-file-count variant proving the executor-side DV shard write
    // (r12 rewrote deleteWhere off the driver funnel; a wide delete
    // across hundreds of files must keep the driver at descriptor-sized
    // state, one DV file per shuffle partition)
    val nFiles = sys.env.get("SPARK_GRAFT_DV_FILES").map(_.toInt)
    val li0 = spark.read.parquet("target/sf10/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val li = nFiles.map(li0.repartition(_)).getOrElse(li0)
    DeltaWrite.write(li, tbl)
    val t1 = System.nanoTime()
    println(f"[dv-smoke] write ${ (t1-t0)/1e9 }%.1f s, files=${DeltaRead.snapshot(tbl).files.size}")
    val v = DeltaWrite.deleteWhere(spark, tbl, col("l_partkey") % 10 === 0)
    val t2 = System.nanoTime()
    val snap = DeltaRead.snapshot(tbl)
    val card = snap.files.flatMap(_.deletionVector).map(_.cardinality).sum
    println(f"[dv-smoke] deleteWhere ${ (t2-t1)/1e9 }%.1f s, version=$v, dv_cardinality=$card")
    val n = DeltaRead.read(spark, tbl).count()
    val t3 = System.nanoTime()
    println(f"[dv-smoke] read-after ${ (t3-t2)/1e9 }%.1f s, rows=$n, phys=${snap.files.flatMap(_.stats).map(_.numRecords).sum}")
    assert(n == snap.files.flatMap(_.stats).map(_.numRecords).sum - card, "accounting")
    println("[dv-smoke] OK")
    spark.stop()
  }
}
