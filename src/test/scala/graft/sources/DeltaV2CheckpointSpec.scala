package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the V2 checkpoint path (PROTOCOL.md §V2 Checkpoints):
  * writing one gates the protocol up with the v2Checkpoint feature,
  * resolution works with NO classic checkpoint present (the spec's
  * pinned path), replay resumes from the UUID top file + sidecars with
  * values, DVs, pruning and stats skipping intact, commits after the
  * checkpoint replay on top, and a missing sidecar fails loudly. */
class DeltaV2CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(pfx: String): String =
    Files.createTempDirectory(pfx).resolve("t").toString

  private def logFiles(t: String, pattern: String): Seq[String] = {
    val listing = Files.list(Paths.get(t, "_delta_log"))
    try listing.iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches(pattern)).toSeq.sorted
    finally listing.close()
  }

  test("v2 checkpoint: resume with no classic checkpoint, DV + pruning intact") {
    val t = tbl("graft_v2cp")
    val df = (1L to 100L).map(i => (i, s"v$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "s", "par")
    DeltaWrite.write(df.coalesce(2), t, Seq("par"))           // v0
    DeltaWrite.write((101L to 120L).map(i => (i, s"v$i", "even"))
      .toDF("id", "s", "par").coalesce(1), t)                 // v1
    DeltaWrite.deleteWhere(spark, t, col("id") % 10 === 0)    // v2+: protocol + DV
    DeltaWrite.optimize(spark, t)              // purges DVs, leaves tombstones
    DeltaWrite.deleteWhere(spark, t, col("id") % 7 === 0)     // fresh DVs
    val headBefore = DeltaRead.read(spark, t)
      .as[(Long, String, String)].collect().toSet

    val cpv = DeltaWrite.checkpointV2(spark, t, sidecars = 2)
    val snapAfter = DeltaRead.snapshot(t)
    assert(cpv == snapAfter.version)
    assert(snapAfter.protocol.readerFeatures.contains("v2Checkpoint"))
    assert(snapAfter.protocol.writerFeatures.contains("v2Checkpoint"))
    // layout: UUID top file + 2 sidecars, NO classic/multipart checkpoint
    assert(logFiles(t, "\\d{20}\\.checkpoint\\.parquet").isEmpty)
    assert(logFiles(t, "\\d{20}\\.checkpoint\\.[A-Za-z0-9-]+\\.parquet").size == 1)
    val sidecars = Files.list(Paths.get(t, "_delta_log", "_sidecars"))
    val sidecarNames = try sidecars.iterator().asScala.toSeq finally sidecars.close()
    assert(sidecarNames.size == 2)

    // drop every JSON commit <= checkpoint version: replay must resume
    // from the v2 checkpoint alone
    logFiles(t, "\\d{20}\\.json")
      .filter(_.stripSuffix(".json").toLong <= cpv)
      .foreach(n => Files.delete(Paths.get(t, "_delta_log", n)))
    val snap = DeltaRead.snapshot(t)
    assert(snap.version == cpv)
    assert(DeltaRead.read(spark, t).as[(Long, String, String)]
      .collect().toSet == headBefore)
    // DV survived the checkpoint (deleted ids stay suppressed — the
    // %10 set was physically purged by optimize, the %7 set rides DVs)
    assert(DeltaRead.read(spark, t)
      .filter(col("id") % 10 === 0 || col("id") % 7 === 0).isEmpty)
    assert(snap.files.exists(_.deletionVector.nonEmpty))
    // tombstones survived (protocol requires checkpoints to retain them)
    assert(snap.tombstones.nonEmpty)
    // partition pruning + stats skipping still plan from checkpoint state
    val pruned = DeltaRead.read(spark, t)
      .filter(col("par") === "odd" && col("id") <= 7L)
    val scheduled = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles.toInt
    }.sum
    val predicted = snap.files.count(f =>
      f.partitionValues.get("par").contains("odd") &&
        f.stats.forall(st => st.min.get("id").forall(_.asLong <= 7L)))
    assert(scheduled == predicted && scheduled < snap.files.size)
    assert(pruned.select(col("id")).as[Long].collect().toSet ==
      Set(1L, 3L, 5L)) // 7 went with the %7 DV delete

    // a commit after the checkpoint replays on top of it
    DeltaWrite.write(Seq((999L, "new", "odd")).toDF("id", "s", "par"), t)
    assert(DeltaRead.read(spark, t).count() == headBefore.size + 1)
    // and time travel to the checkpointed version still resolves
    assert(DeltaRead.readAt(spark, t, cpv).count() == headBefore.size)
  }

  test("v2 checkpoint with a missing sidecar fails loudly") {
    val t = tbl("graft_v2cp_missing")
    DeltaWrite.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "s"), t)
    val cpv = DeltaWrite.checkpointV2(spark, t, sidecars = 1)
    logFiles(t, "\\d{20}\\.json")
      .filter(_.stripSuffix(".json").toLong <= cpv)
      .foreach(n => Files.delete(Paths.get(t, "_delta_log", n)))
    val sidecarDir = Paths.get(t, "_delta_log", "_sidecars")
    val listing = Files.list(sidecarDir)
    val sc = try listing.iterator().asScala.toSeq finally listing.close()
    Files.delete(sc.head)
    val ex = intercept[IllegalArgumentException] { DeltaRead.snapshot(t) }
    assert(ex.getMessage.contains("sidecar"))
  }
}
