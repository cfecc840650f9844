package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.{DeltaRead, DeltaWrite}

/** High-file-count Delta replay smoke: a synthetic 50k-add log (the
  * metadata scale of a ~6 TB table at 128 MB files), replayed three
  * ways — raw JSON history, classic checkpoint, v2 checkpoint with
  * sidecars — recording wall time and driver heap after each. The data
  * files are fabricated (replay never opens them); this measures
  * exactly the driver-side planning state the FileIndex seam must
  * hold. Run: sbt "runMain graft.tools.ReplaySmoke [files] [commits]" */
object ReplaySmoke {
  def main(args: Array[String]): Unit = {
    val totalFiles = args.headOption.map(_.toInt).getOrElse(50000)
    val commits = args.lift(1).map(_.toInt).getOrElse(10)
    val perCommit = totalFiles / commits
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-replay-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = Files.createTempDirectory("graft_replay_smoke").resolve("t")
    val logDir = t.resolve("_delta_log")
    Files.createDirectories(logDir)
    val schema = """{"type":"struct","fields":[
      {"name":"id","type":"long","nullable":true,"metadata":{}},
      {"name":"s","type":"string","nullable":true,"metadata":{}},
      {"name":"par","type":"string","nullable":true,"metadata":{}}]}"""
      .replaceAll("\n\\s*", "")
    (0 until commits).foreach { c =>
      val sb = new StringBuilder
      if (c == 0) {
        sb.append("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
          .append('\n')
        sb.append(s"""{"metaData":{"id":"smoke","format":{"provider":"parquet"},"schemaString":${com.fasterxml.jackson.databind.node.TextNode.valueOf(schema).toString},"partitionColumns":["par"],"configuration":{}}}""")
          .append('\n')
      }
      (0 until perCommit).foreach { i =>
        val n = c * perCommit + i
        sb.append(s"""{"add":{"path":"par=p${n % 64}/f$n.parquet","partitionValues":{"par":"p${n % 64}"},"size":134217728,"modificationTime":0,"dataChange":true,"stats":"{\\"numRecords\\":1000000,\\"minValues\\":{\\"id\\":${n * 1000L}},\\"maxValues\\":{\\"id\\":${n * 1000L + 999}},\\"nullCount\\":{\\"id\\":0}}"}}""")
          .append('\n')
      }
      Files.write(logDir.resolve(f"$c%020d.json"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
    }

    def heapMb(): Long = {
      System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory - rt.freeMemory) / (1 << 20)
    }
    def timed(label: String)(f: => DeltaRead.Snapshot): Unit = {
      val t0 = System.nanoTime()
      val snap = f
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[replay-smoke] $label: files=${snap.files.size} " +
        f"wall=$wall%.2fs heapAfter=${heapMb()}MB")
    }

    timed(s"raw JSON ($commits commits x $perCommit adds)") {
      DeltaRead.snapshot(t.toString)
    }
    DeltaWrite.checkpoint(spark, t.toString)
    val jsons = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      jsons.iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.json")).toSeq
        .foreach(Files.delete)
    } finally jsons.close()
    timed("classic checkpoint") { DeltaRead.snapshot(t.toString) }
    DeltaWrite.checkpointV2(spark, t.toString, sidecars = 4)
    // drop the protocol-upgrade commit so replay is checkpoint-only
    val jsons2 = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      jsons2.iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.json")).toSeq
        .foreach(Files.delete)
    } finally jsons2.close()
    // also drop the superseded classic checkpoint so v2 resolution is
    // exercised (classic resolves first when both exist)
    val cls = logDir.resolve(f"${0L}%020d.checkpoint.parquet")
    Files.deleteIfExists(cls)
    val listing = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.checkpoint\\.parquet"))
        .toSeq.foreach(Files.delete)
    } finally listing.close()
    timed("v2 checkpoint (4 sidecars)") { DeltaRead.snapshot(t.toString) }
    spark.stop()
  }
}
