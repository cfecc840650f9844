package graft.sources

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Writes on COLUMN-MAPPED Delta tables (name mode is the Databricks
  * default on new tables): append, dynamic partition overwrite,
  * optimize, MERGE, and clause MERGE all stage in the PHYSICAL column
  * space — files carry physical names, add pv/stats keys are physical,
  * and a conformant (physical-resolving) reader sees exactly the right
  * bytes — while the caller works purely in logical names. */
class DeltaMappedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def mapped(pfx: String): (String, Map[String, String]) = {
    val t = Files.createTempDirectory(pfx).resolve("t").toString
    val mapping = Map("id" -> "col_1", "s" -> "col_2", "par" -> "col_3")
    val base = (1L to 10L).map(i => (i, s"v$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "s", "par")
    DeltaFixture.commitMapped(spark, t,
      base.schema, Seq("par"), 0L, mapping,
      Seq("even", "odd").map(p => Map("par" -> p) ->
        base.filter(col("par") === p)))
    (t, mapping)
  }

  private def content(t: String): Set[(Long, String, String)] =
    DeltaRead.read(spark, t).as[(Long, String, String)].collect().toSet

  test("append + dynamic partition overwrite stage physically") {
    val (t, mapping) = mapped("graft_cm_write")
    DeltaWrite.write(Seq((11L, "v11", "odd")).toDF("id", "s", "par"), t)
    assert(content(t) == ((1L to 11L).map(i =>
      (i, s"v$i", if (i % 2 == 0) "even" else "odd")).toSet))
    // the new add's pv keys and file columns must be PHYSICAL
    val snapLines = java.nio.file.Files.readString(
      java.nio.file.Paths.get(t, "_delta_log", f"${1L}%020d.json"))
    assert(snapLines.contains("\"col_3\":\"odd\""), snapLines)
    val newFile = DeltaRead.snapshot(t).files
      .filter(_.partitionValues.get("par").contains("odd"))
      .maxBy(_.path)
    val raw = spark.read.parquet(
      java.nio.file.Paths.get(t).resolve(newFile.path).toString)
    assert(raw.columns.toSet == Set("col_1", "col_2"), raw.columns.toSeq)
    // dynamic partition overwrite: only the even tuple is replaced
    DeltaWrite.write(Seq((100L, "only", "even")).toDF("id", "s", "par"), t,
      mode = "overwritePartitions")
    assert(content(t) == ((1L to 11L).filter(_ % 2 == 1)
      .map(i => (i, s"v$i", "odd")).toSet + ((100L, "only", "even"))))
  }

  test("optimize compacts a mapped table, stats keyed physically") {
    val (t, _) = mapped("graft_cm_opt")
    DeltaWrite.write(Seq((11L, "v11", "odd")).toDF("id", "s", "par"), t)
    val before = content(t)
    val (n0, n1) = DeltaWrite.optimize(spark, t)
    assert(n1 < n0)
    assert(content(t) == before)
    // rewritten adds carry stats; replay normalizes keys to LOGICAL
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.exists(_.stats.exists(_.min.contains("id"))))
    // and stats-pruning on the logical predicate still plans
    val probe = DeltaRead.read(spark, t).filter(col("id") === 11L)
    assert(probe.as[(Long, String, String)].collect().toSeq ==
      Seq((11L, "v11", "odd")))
  }

  test("merge and clause merge rewrite mapped tables copy-on-write") {
    val (t, _) = mapped("graft_cm_merge")
    DeltaWrite.merge(spark, t,
      Seq((2L, "patched", "even"), (20L, "new", "even")).toDF("id", "s", "par"),
      Seq("id"))
    assert(content(t) == ((1L to 10L).filterNot(_ == 2L).map(i =>
      (i, s"v$i", if (i % 2 == 0) "even" else "odd")).toSet ++
      Set((2L, "patched", "even"), (20L, "new", "even"))))
    DeltaWrite.mergeClauses(spark, t,
      Seq((3L, "x", "odd")).toDF("id", "s", "par"), Seq("id"),
      Seq(MergeClauses.MatchedDelete(),
        MergeClauses.BySourceUpdate(
          Map("s" -> concat(lit("seen_"), col("t.s"))))))
    // id 3 deleted (matched); every other row was unsourced, so the
    // BY SOURCE update prefixed all of them
    val got = content(t)
    assert(!got.exists(_._1 == 3L))
    assert(got.nonEmpty && got.forall(_._2.startsWith("seen_")))
    assert(got.contains((2L, "seen_patched", "even")))
    assert(got.contains((20L, "seen_new", "even")))
  }

  test("id-mode table: appended files carry parquet field ids") {
    val t = Files.createTempDirectory("graft_cm_id").resolve("t").toString
    val mapping = Map("id" -> "c_1", "s" -> "c_2")
    val base = (1L to 5L).map(i => (i, s"v$i")).toDF("id", "s")
    DeltaFixture.commitMappedId(spark, t, base.schema, Nil, 0L, mapping,
      Seq(Map.empty[String, String] -> base))
    DeltaWrite.write(Seq((6L, "v6")).toDF("id", "s"), t)
    // the full table reads through id resolution (old + new files)
    assert(DeltaRead.read(spark, t).as[(Long, String)].collect().toSet ==
      (1L to 6L).map(i => (i, s"v$i")).toSet)
    // the appended file must physically carry the field ids the table
    // declares — without them id-resolving readers reject the file
    val newFile = DeltaRead.snapshot(t).files.maxBy(_.path)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(
          java.nio.file.Paths.get(t).resolve(newFile.path).toUri),
        spark.sparkContext.hadoopConfiguration))
    val ids = try footer.getFooter.getFileMetaData.getSchema.getFields
      .asScala.map(f => f.getName -> Option(f.getId).map(_.intValue)).toMap
    finally footer.close()
    assert(ids == Map("c_1" -> Some(1), "c_2" -> Some(2)), ids.toString)
  }

  test("schema evolution on a mapped table still rejects loudly") {
    val (t, _) = mapped("graft_cm_evo")
    val ex = intercept[IllegalArgumentException] {
      DeltaWrite.write((1L to 2L).map(i => (i, s"v$i", "odd", true))
        .toDF("id", "s", "par", "flag"), t, mergeSchema = true)
    }
    assert(ex.getMessage.contains("column-mapped"))
  }
}
