package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of Iceberg field-id schema evolution (Table Spec §Schema
  * Evolution): rename is metadata-only and serves BOTH eras' files
  * through field-id resolution, appends after a rename keep ids stable,
  * a dropped-then-re-added column NEVER resurrects old data (fresh id),
  * and the declared rejects (drop a partition source, rename onto an
  * existing name) are loud. */
class IcebergSchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(pfx: String): String =
    Files.createTempDirectory(pfx).resolve("t").toString

  test("rename: both eras read under the new name, ids stable") {
    val t = tbl("graft_evo_rename")
    IcebergWrite.write((1L to 5L).map(i => (i, s"old$i")).toDF("id", "label"), t)
    val v = IcebergWrite.renameColumn(t, "label", "title")
    assert(v == 2)
    val snap = IcebergRead.snapshot(t)
    assert(snap.resolveById, "evolved table must resolve by field id")
    assert(snap.schema.fieldNames.toSeq == Seq("id", "title"))
    // era 1 files store the column as 'label' (id 2); the read serves
    // it as 'title' through the id
    assert(IcebergRead.read(spark, t).as[(Long, String)].collect().toSet ==
      (1L to 5L).map(i => (i, s"old$i")).toSet)
    // era 2 appends under the NEW name; id stays 2
    IcebergWrite.write((6L to 8L).map(i => (i, s"new$i")).toDF("id", "title"), t)
    assert(IcebergRead.read(spark, t).as[(Long, String)].collect().toSet ==
      ((1L to 5L).map(i => (i, s"old$i")) ++ (6L to 8L).map(i => (i, s"new$i"))).toSet)
    val nameToId = IcebergRead.snapshot(t).fieldIdToName.map(_.swap)
    assert(nameToId == Map("id" -> 1, "title" -> 2))
    // incremental read across the rename serves the current names too
    assert(IcebergRead.readAppends(spark, t, 1L, 2L)
      .as[(Long, String)].collect().toSet ==
      (6L to 8L).map(i => (i, s"new$i")).toSet)
  }

  test("drop then re-add: old data never leaks into the new column") {
    val t = tbl("graft_evo_drop")
    IcebergWrite.write((1L to 4L).map(i => (i, s"secret$i")).toDF("id", "note"), t)
    IcebergWrite.dropColumn(t, "note")
    assert(IcebergRead.snapshot(t).schema.fieldNames.toSeq == Seq("id"))
    assert(IcebergRead.read(spark, t).as[Long].collect().toSet == (1L to 4L).toSet)
    // re-add the same NAME via mergeSchema append — fresh field id
    IcebergWrite.write(Seq((9L, "fresh")).toDF("id", "note"), t,
      mergeSchema = true)
    val snap = IcebergRead.snapshot(t)
    val nameToId = snap.fieldIdToName.map(_.swap)
    assert(nameToId("id") == 1 && nameToId("note") > 2,
      s"re-added column must get a FRESH id, got $nameToId")
    val got = IcebergRead.read(spark, t).as[(Long, Option[String])]
      .collect().toSet
    assert(got == ((1L to 4L).map(i => (i, None: Option[String])).toSet +
      ((9L, Some("fresh"))): Set[(Long, Option[String])]),
      s"old 'secret' values must NOT resurrect: $got")
  }

  test("maintenance after rename keeps serving both eras") {
    val t = tbl("graft_evo_maint")
    IcebergWrite.write((1L to 6L).map(i => (i, s"v$i", i * 1.0))
      .toDF("id", "label", "x"), t)
    IcebergWrite.renameColumn(t, "x", "score")
    IcebergWrite.merge(spark, t,
      Seq((2L, "patched", 99.0), (10L, "new", 10.0)).toDF("id", "label", "score"),
      Seq("id"))
    val got = IcebergRead.read(spark, t).as[(Long, String, Double)].collect().toSet
    assert(got == ((1L to 6L).filterNot(_ == 2L).map(i => (i, s"v$i", i * 1.0)).toSet
      ++ Set((2L, "patched", 99.0), (10L, "new", 10.0))))
    // compaction rewrites era-1 files through the id-resolving scan
    IcebergWrite.rewriteDataFiles(spark, t)
    assert(IcebergRead.read(spark, t).as[(Long, String, Double)]
      .collect().toSet == got)
  }

  test("declared rejects are loud") {
    val t = tbl("graft_evo_guard")
    IcebergWrite.write((1L to 3L).map(i => (i, s"v$i", s"p${i % 2}"))
      .toDF("id", "s", "par"), t, Seq("par"))
    intercept[IllegalArgumentException] { IcebergWrite.dropColumn(t, "par") }
    intercept[IllegalArgumentException] { IcebergWrite.renameColumn(t, "s", "id") }
    intercept[IllegalArgumentException] { IcebergWrite.renameColumn(t, "nope", "x") }
  }
}
