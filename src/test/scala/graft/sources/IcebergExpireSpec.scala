package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of IcebergWrite.expireSnapshots: retained state is
  * untouched, files reachable only from expired snapshots are physically
  * reclaimed, time travel to an expired id rejects loudly, and the
  * truncation itself is a CAS-fenced metadata commit. */
class IcebergExpireSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_ice_expire").resolve("t").toString

  private def rows(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("appends-only expiry reclaims old manifests, keeps all data files") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 10), t)
    IcebergWrite.write(rows(11 to 20), t)
    IcebergWrite.write(rows(21 to 30), t)
    val preData = IcebergRead.snapshot(t).files.map(_.path).toSet
    val deleted = IcebergWrite.expireSnapshots(t, keepLast = 1)
    assert(deleted > 0) // snapshots 1-2's manifest lists + manifests
    val snap = IcebergRead.snapshot(t)
    assert(snap.files.map(_.path).toSet == preData) // appends share data files
    assert(snap.files.forall(f => Files.exists(Paths.get(f.path))))
    assert(IcebergRead.read(spark, t).count() == 30)
  }

  test("overwrite history: expiry physically deletes unreachable data files") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 10), t)                       // s1: evens era
    val oldData = IcebergRead.snapshot(t).files.map(_.path).toSet
    IcebergWrite.write(rows(100 to 110), t, mode = "overwrite") // s2
    assert(oldData.forall(p => Files.exists(Paths.get(p)))) // time travel holds them
    val deleted = IcebergWrite.expireSnapshots(t, keepLast = 1)
    assert(deleted > 0)
    assert(oldData.forall(p => !Files.exists(Paths.get(p)))) // released
    assert(IcebergRead.read(spark, t).count() == 11)
  }

  test("expired time travel rejects; retained time travel still serves") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 5), t)   // s1
    IcebergWrite.write(rows(6 to 9), t)   // s2
    IcebergWrite.write(rows(10 to 12), t) // s3
    IcebergWrite.expireSnapshots(t, keepLast = 2)
    assert(IcebergRead.readAt(spark, t, 2L).count() == 9)
    intercept[Exception] { IcebergRead.snapshotAt(t, 1L) }
  }

  test("no-op below keepLast; keepLast >= 1 enforced; version bumps") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 5), t)
    assert(IcebergWrite.expireSnapshots(t, keepLast = 3) == 0)
    intercept[IllegalArgumentException] {
      IcebergWrite.expireSnapshots(t, keepLast = 0)
    }
    IcebergWrite.write(rows(6 to 9), t)
    val hintBefore = Files.readString(
      Paths.get(t, "metadata", "version-hint.text")).trim.toInt
    IcebergWrite.expireSnapshots(t, keepLast = 1)
    val hintAfter = Files.readString(
      Paths.get(t, "metadata", "version-hint.text")).trim.toInt
    assert(hintAfter == hintBefore + 1)
    // a subsequent write commits cleanly on the truncated lineage
    IcebergWrite.write(rows(10 to 12), t)
    assert(IcebergRead.read(spark, t).count() == 12)
  }
}
