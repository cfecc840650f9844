package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.{IcebergRead, IcebergWrite}

/** Iceberg commit-cost smoke: seed a table with F files, then time N
  * single-file appends. With manifest-carrying commits the per-append
  * metadata work is O(1) in F (one 1-entry manifest + a list of
  * manifest references); before r14 every append rewrote all F live
  * entries. Run: sbt "runMain graft.tools.IcebergCommitSmoke [F] [N]" */
object IcebergCommitSmoke {
  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(512)
    val appends = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-iceberg-commit-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t = java.nio.file.Files.createTempDirectory("graft_ice_commit")
      .resolve("t").toString
    val seed0 = System.nanoTime()
    IcebergWrite.write((1L to files.toLong * 100).map(i => (i, s"v$i"))
      .toDF("id", "s").repartition(files), t)
    println(f"[commit-smoke] seed: $files files in " +
      f"${(System.nanoTime() - seed0) / 1e9}%.1fs")
    val walls = (1 to appends).map { i =>
      val t0 = System.nanoTime()
      IcebergWrite.write(Seq((1000000L + i, "x")).toDF("id", "s"), t)
      (System.nanoTime() - t0) / 1e9
    }
    val snap = IcebergRead.snapshot(t)
    println(f"[commit-smoke] $appends single-file appends over a " +
      f"$files-file table: mean=${walls.sum / walls.size}%.3fs " +
      f"min=${walls.min}%.3fs max=${walls.max}%.3fs; " +
      f"live files=${snap.files.size}")
    spark.stop()
  }
}
