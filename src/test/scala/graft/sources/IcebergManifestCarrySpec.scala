package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of manifest-carrying commits (the spec's — and every real
  * writer's — commit shape): an append CARRIES previous manifest files
  * verbatim and adds one manifest holding ONLY the new entries (commit
  * cost O(delta), not O(live files)); a remove rewrites exactly the
  * touched manifests; and the changelog attributes changes by
  * added_snapshot_id, so carried manifests' status-1 entries are never
  * re-reported as later snapshots' appends. */
class IcebergManifestCarrySpec extends SparkSpec {
  import spark.implicits._

  private def tbl(pfx: String): String =
    Files.createTempDirectory(pfx).resolve("t").toString

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def currentManifests(t: String): Seq[GenericRecord] = {
    val metaDir = Paths.get(t, "metadata")
    val v = Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val meta = mapper.readTree(Files.readString(
      metaDir.resolve(s"v$v.metadata.json")))
    val curId = meta.get("current-snapshot-id").asLong
    val sn = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curId).get
    IcebergRead.avroRows(IcebergRead.resolve(t, sn.get("manifest-list").asText))
  }

  private def entriesOf(t: String, m: GenericRecord): Seq[GenericRecord] =
    IcebergRead.avroRows(IcebergRead.resolve(t, m.get("manifest_path").toString))

  test("appends carry previous manifests; new manifest holds only the delta") {
    val t = tbl("graft_carry_append")
    IcebergWrite.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(4), t)                                   // s1: 4 files
    val ml1 = currentManifests(t).map(_.get("manifest_path").toString)
    IcebergWrite.write(Seq((101L, "x")).toDF("id", "s"), t) // s2: 1 file
    val ml2 = currentManifests(t)
    // s1's manifest file is carried BYTE-IDENTICAL (same path), plus
    // exactly one new manifest whose entries are only s2's add
    assert(ml2.map(_.get("manifest_path").toString).toSet
      .intersect(ml1.toSet) == ml1.toSet, "s1 manifests must be carried")
    val fresh = ml2.filterNot(m => ml1.contains(m.get("manifest_path").toString))
    assert(fresh.size == 1)
    val freshEntries = entriesOf(t, fresh.head)
    assert(freshEntries.size == 1, s"delta manifest must hold ONLY the " +
      s"appended file, got ${freshEntries.size} entries")
    // commit cost stays O(delta) as the table grows
    IcebergWrite.write(Seq((102L, "y")).toDF("id", "s"), t) // s3
    val fresh3 = currentManifests(t)
      .filterNot(m => ml2.exists(_.get("manifest_path") == m.get("manifest_path")))
    assert(fresh3.size == 1 && entriesOf(t, fresh3.head).size == 1)
    assert(IcebergRead.read(spark, t).count() == 102)
  }

  test("a remove rewrites exactly the touched manifests") {
    val t = tbl("graft_carry_remove")
    IcebergWrite.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), t)                                       // s1
    IcebergWrite.write((51L to 99L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), t)                                       // s2
    val before = currentManifests(t).map(_.get("manifest_path").toString)
    // merge touches only s2's key range -> only s2's manifest rewrites
    IcebergWrite.merge(spark, t, Seq((60L, "patched")).toDF("id", "s"),
      Seq("id"))                                             // s3
    val after = currentManifests(t)
    val carried = after.map(_.get("manifest_path").toString)
      .toSet.intersect(before.toSet)
    assert(carried.size == 1, s"exactly one of the two old manifests must " +
      s"be carried, got $carried")
    // the rewritten manifest marks the removed file DELETED under s3
    val rewritten = after.filter(m =>
      !before.contains(m.get("manifest_path").toString) &&
        entriesOf(t, m).exists(e =>
          e.get("status").asInstanceOf[Number].intValue == 2))
    assert(rewritten.size == 1)
    assert(IcebergRead.read(spark, t).filter(col("id") === 60L)
      .select(col("s")).as[String].collect().toSeq == Seq("patched"))
  }

  test("changelog never re-reports carried manifests' files") {
    val t = tbl("graft_carry_changes")
    IcebergWrite.write((1L to 20L).map(i => (i, s"v$i")).toDF("id", "s"), t) // s1
    IcebergWrite.write((21L to 25L).map(i => (i, s"v$i")).toDF("id", "s"), t) // s2
    // s2's manifest list physically contains s1's manifest with its
    // STATUS-1 entries (the foreign/real-writer shape): appends and
    // changes of (s1, s2] must still be exactly s2's rows
    assert(IcebergRead.readAppends(spark, t, 1L, 2L)
      .select(col("id")).as[Long].collect().toSet == (21L to 25L).toSet)
    val ch = IcebergRead.readChanges(spark, t, 1L, 2L)
    assert(ch.filter(col("_change_type") === "insert")
      .select(col("id")).as[Long].collect().toSet == (21L to 25L).toSet)
    assert(ch.filter(col("_snapshot_id") === 1L).isEmpty)
  }

  test("expire reclaims carried manifests only when no retained snapshot needs them") {
    val t = tbl("graft_carry_expire")
    IcebergWrite.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "s"), t) // s1
    IcebergWrite.write(Seq((11L, "x")).toDF("id", "s"), t)                   // s2
    IcebergWrite.write(Seq((12L, "y")).toDF("id", "s"), t)                   // s3
    // keep only s3: its list still references s1's and s2's manifests,
    // which must survive the expiry sweep
    IcebergWrite.expireSnapshots(t, keepLast = 1)
    assert(IcebergRead.read(spark, t).count() == 12)
    assert(currentManifests(t).size == 3)
  }
}
