package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of DeltaWrite.restore and IcebergWrite.rollback: the head
  * state returns to the target version/snapshot, history stays
  * time-travelable, Iceberg's rollback moves no data, post-rollback
  * writes never collide with rolled-over snapshot ids, and the declared
  * rejects (vacuumed restore target, unknown rollback id) are loud. */
class RestoreRollbackSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(pfx: String): String =
    Files.createTempDirectory(pfx).resolve("t").toString

  private def rows(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("delta restore: state returns to the target, history preserved") {
    val t = tbl("graft_restore")
    DeltaWrite.write(rows(1 to 10), t)                    // v0
    DeltaWrite.write(rows(11 to 15), t)                   // v1
    DeltaWrite.deleteWhere(spark, t, col("id") % 5 === 0) // v2 (DVs)
    assert(DeltaRead.read(spark, t).count() == 12)
    val v = DeltaWrite.restore(spark, t, 1L)              // v3
    assert(v == 3L)
    assert(DeltaRead.read(spark, t).as[(Long, String)].collect().toSet ==
      (1 to 15).map(i => (i.toLong, s"v$i")).toSet)
    // the restored-over version still time-travels
    assert(DeltaRead.readAt(spark, t, 2L).count() == 12)
    // restore to the CURRENT state is a no-op (head version unchanged)
    assert(DeltaWrite.restore(spark, t, 1L) == 3L)
  }

  test("delta restore past a vacuum fails loudly") {
    val t = tbl("graft_restore_vac")
    DeltaWrite.write(rows(1 to 6).coalesce(1), t)              // v0
    DeltaWrite.write(rows(1 to 3).coalesce(1), t, mode = "overwrite") // v1
    assert(DeltaWrite.vacuum(spark, t) > 0) // v0's file physically gone
    val ex = intercept[IllegalArgumentException] {
      DeltaWrite.restore(spark, t, 0L)
    }
    assert(ex.getMessage.contains("vacuumed"))
  }

  test("iceberg rollback: metadata-only, ids never collide after") {
    val t = tbl("graft_rollback")
    IcebergWrite.write(rows(1 to 10), t)                   // s1
    IcebergWrite.write(rows(11 to 99), t, mode = "overwrite") // s2
    val dataFiles = Files.walk(Paths.get(t, "data")).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet"))
    IcebergWrite.rollback(t, 1L)
    // no data moved, no file deleted — one metadata version repointed
    assert(Files.walk(Paths.get(t, "data")).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet")) == dataFiles)
    assert(IcebergRead.read(spark, t).count() == 10)
    assert(IcebergRead.readAt(spark, t, 2L).count() == 89) // still retained
    // a write after the rollback must take a FRESH id (not current+1=2)
    val sid = IcebergWrite.write(rows(100 to 102), t)
    assert(sid == 3L)
    val metaDir = Paths.get(t, "metadata")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val ids = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(metaDir.resolve(s"v$version.metadata.json")))
      .get("snapshots").elements().asScala.map(_.get("snapshot-id").asLong).toSeq
    assert(ids == ids.distinct, s"duplicate snapshot ids: $ids")
    assert(IcebergRead.read(spark, t).count() == 13) // rolled-back base + append
  }

  test("delta restore to a version whose DV was vacuumed fails loudly") {
    val t = tbl("graft_restore_dv")
    DeltaWrite.write(rows(1 to 10).coalesce(1), t)          // v0
    DeltaWrite.deleteWhere(spark, t, col("id") === 1L)      // v1: DV #1
    DeltaWrite.deleteWhere(spark, t, col("id") === 2L)      // v2: DV #2 supersedes #1
    assert(DeltaWrite.vacuum(spark, t) > 0)                 // DV #1 physically gone
    val ex = intercept[IllegalArgumentException] {
      DeltaWrite.restore(spark, t, 1L)
    }
    assert(ex.getMessage.contains("deletion vector"))
    // the head is untouched by the failed restore
    assert(DeltaRead.read(spark, t).count() == 8)
  }

  test("iceberg changelog and appends follow parent lineage across rollback") {
    val t = tbl("graft_rollback_lineage")
    IcebergWrite.write(rows(1 to 10), t)                    // s1
    IcebergWrite.write(rows(11 to 15), t)                   // s2 (rolled over below)
    IcebergWrite.rollback(t, 1L)
    val s3 = IcebergWrite.merge(spark, t,
      Seq((1L, "patched"), (100L, "new")).toDF("id", "s"), Seq("id")) // parent = s1
    assert(s3 == 3L)
    // changes of s3 vs its TRUE parent s1: delete of (1,v1) + inserts —
    // array-predecessor resolution would diff against s2's state instead
    val ch = IcebergRead.readChanges(spark, t, 1L, s3)
      .select("id", "s", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(ch.contains((1L, "v1", "delete")))
    assert(ch.contains((1L, "patched", "insert")))
    assert(ch.contains((100L, "new", "insert")))
    assert(!ch.exists(_._2 == "v11"), s"rolled-over s2 rows leaked: $ch")
    // full-history changelog skips the rolled-over snapshot entirely
    val all = IcebergRead.readChanges(spark, t, 0L, s3)
    assert(all.filter(col("_snapshot_id") === 2L).isEmpty)
    // a rolled-over from is NOT an ancestor of the head — loud reject
    val ex = intercept[IllegalArgumentException] {
      IcebergRead.readChanges(spark, t, 2L, s3)
    }
    assert(ex.getMessage.contains("not an ancestor"))
    // appends across the rollback: s4's rows only, never s2's
    val s4 = IcebergWrite.write(rows(200 to 201), t)
    assert(IcebergRead.readAppends(spark, t, s3, s4)
      .as[(Long, String)].collect().toSet ==
      Set((200L, "v200"), (201L, "v201")))
  }

  test("iceberg rollback rejects unknown ids; expiry keeps a rolled-back current") {
    val t = tbl("graft_rollback_guard")
    IcebergWrite.write(rows(1 to 5), t)  // s1
    IcebergWrite.write(rows(6 to 9), t)  // s2
    intercept[IllegalArgumentException] { IcebergWrite.rollback(t, 99L) }
    IcebergWrite.rollback(t, 1L)
    // current (s1) sits OUTSIDE the newest-1 suffix; expiry must keep it
    IcebergWrite.expireSnapshots(t, keepLast = 1)
    assert(IcebergRead.read(spark, t).count() == 5)
    assert(IcebergRead.snapshot(t).snapshotId == 1L)
  }
}
