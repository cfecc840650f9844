package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the distributed Delta write path: commit numbering, the
  * three write modes' liveness semantics, hive-escaped and NULL partition
  * values round-tripping through the log, schema enforcement on append,
  * checkpoint resume of a written table, and mutual interop with
  * [[DeltaFixture]]-authored logs. */
class DeltaWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_delta_write").resolve("t").toString

  private val base = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"),
    (4L, "b", "y")).toDF("id", "p", "v")

  test("append commits stack: v0 creates, v1 appends, both live") {
    val t = tbl()
    assert(DeltaWrite.write(base, t, Seq("p")) == 0L)
    assert(DeltaWrite.write(Seq((5L, "c", "z")).toDF("id", "p", "v"), t) == 1L)
    val snap = DeltaRead.snapshot(t)
    assert(snap.version == 1L && snap.partitionColumns == Seq("p"))
    val rows = DeltaRead.read(spark, t).as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"),
      (4L, "b", "y"), (5L, "c", "z")))
    // no staging residue, commit files well-named
    assert(!Files.list(Paths.get(t)).iterator().asScala.exists(
      _.getFileName.toString.startsWith("_staging")))
    assert(Files.exists(Paths.get(t, "_delta_log", f"${1L}%020d.json")))
  }

  test("overwrite tombstones every previously-live file") {
    val t = tbl()
    DeltaWrite.write(base, t, Seq("p"))
    DeltaWrite.write(Seq((9L, "z", "w")).toDF("id", "p", "v"), t, mode = "overwrite")
    val rows = DeltaRead.read(spark, t).as[(Long, String, String)].collect().toSet
    assert(rows == Set((9L, "z", "w")))
    // the old files are still on disk (immutable data, log-driven liveness)
    // but excluded from the snapshot
    assert(DeltaRead.snapshot(t).files.size ==
      DeltaRead.read(spark, t).inputFiles.length)
  }

  test("overwritePartitions replaces only the partitions being written") {
    val t = tbl()
    DeltaWrite.write(base, t, Seq("p"))
    DeltaWrite.write(Seq((10L, "a", "new")).toDF("id", "p", "v"), t,
      mode = "overwritePartitions")
    val rows = DeltaRead.read(spark, t).as[(Long, String, String)].collect().toSet
    assert(rows == Set((10L, "a", "new"), (3L, "b", "x"), (4L, "b", "y")),
      "'a' replaced wholesale, 'b' untouched")
  }

  test("hive-escaped and NULL partition values round-trip through the log") {
    val t = tbl()
    // ':' and '=' are hive-escaped in the directory name; null maps to
    // __HIVE_DEFAULT_PARTITION__ on disk and JSON null in the log
    val df = Seq((1L, Some("x:y=z"), "a"), (2L, None, "b"))
      .toDF("id", "p", "v")
    DeltaWrite.write(df, t, Seq("p"))
    val snap = DeltaRead.snapshot(t)
    val pvs = snap.files.map(_.partitionValues("p")).toSet
    assert(pvs == Set("x:y=z", null))
    val back = DeltaRead.read(spark, t)
      .select($"id", $"p").as[(Long, Option[String])].collect().toSet
    assert(back == Set((1L, Some("x:y=z")), (2L, None)))
  }

  test("append with a mismatched schema is rejected loudly") {
    val t = tbl()
    DeltaWrite.write(base, t, Seq("p"))
    val bad = Seq((1L, "a", 5)).toDF("id", "p", "v") // v is int, not string
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.write(bad, t)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("checkpoint resume: snapshot after checkpoint + later commit") {
    val t = tbl()
    DeltaWrite.write(base, t, Seq("p"))
    DeltaWrite.write(Seq((5L, "c", "z")).toDF("id", "p", "v"), t)
    DeltaWrite.checkpoint(spark, t)
    DeltaWrite.write(Seq((6L, "d", "q")).toDF("id", "p", "v"), t)
    val snap = DeltaRead.snapshot(t)
    assert(snap.version == 2L)
    assert(DeltaRead.read(spark, t).count() == 6)
  }

  test("checkpoint parquet carries the protocol's fixed physical schema + tombstones") {
    import org.apache.spark.sql.types._
    val t = tbl()
    DeltaWrite.write(base, t, Seq("p"))
    // overwrite partition 'a' → two remove tombstones in the log state
    DeltaWrite.write(Seq((10L, "a", "new")).toDF("id", "p", "v"), t,
      mode = "overwritePartitions")
    DeltaWrite.checkpoint(spark, t)
    val cp = spark.read.parquet(
      Paths.get(t, "_delta_log", f"${1L}%020d.checkpoint.parquet").toString)
    val sch = cp.schema
    // partitionValues MUST be map<string,string> (inference would emit a
    // struct keyed by this table's column names — real engines reject it)
    val addT = sch("add").dataType.asInstanceOf[StructType]
    assert(addT("partitionValues").dataType ==
      MapType(StringType, StringType, valueContainsNull = true))
    assert(addT("stats").dataType == StringType)
    val protoT = sch("protocol").dataType.asInstanceOf[StructType]
    assert(protoT("minReaderVersion").dataType == IntegerType)
    assert(protoT("minWriterVersion").dataType == IntegerType)
    val metaT = sch("metaData").dataType.asInstanceOf[StructType]
    assert(metaT("partitionColumns").dataType == ArrayType(StringType))
    assert(metaT("configuration").dataType == MapType(StringType, StringType))
    // remove tombstones are retained through compaction
    val removed = cp.filter($"remove".isNotNull).select($"remove.path")
      .as[String].collect()
    assert(removed.length == 2, s"expected 2 tombstones, got ${removed.toSeq}")
    assert(removed.forall(_.startsWith("p=a")))
    // and the post-checkpoint snapshot still resumes correctly
    val snap = DeltaRead.snapshot(t)
    assert(snap.tombstones.map(_.path).toSet == removed.toSet)
    assert(DeltaRead.read(spark, t).count() == 3)
  }

  test("multi-part checkpoint: parts written per the naming scheme, resume identical") {
    val t = tbl()
    DeltaWrite.write(base, t, Seq("p"))
    DeltaWrite.write(Seq((5L, "c", "z")).toDF("id", "p", "v"), t)
    val beforeRows = DeltaRead.read(spark, t)
      .as[(Long, String, String)].collect().toSet
    DeltaWrite.checkpoint(spark, t, parts = 3)
    val logDir = Paths.get(t, "_delta_log")
    (1 to 3).foreach(p => assert(Files.exists(
      logDir.resolve(f"${1L}%020d.checkpoint.$p%010d.${3}%010d.parquet"))))
    assert(Files.readString(logDir.resolve("_last_checkpoint"))
      .contains("\"parts\":3"))
    // truncate the JSON history: the snapshot must resume from parts alone
    Seq(0L, 1L).foreach(v =>
      Files.deleteIfExists(logDir.resolve(f"$v%020d.json")))
    val snap = DeltaRead.snapshot(t)
    assert(snap.version == 1L && snap.partitionColumns == Seq("p"))
    assert(DeltaRead.read(spark, t)
      .as[(Long, String, String)].collect().toSet == beforeRows)
    // a missing part fails loudly instead of silently under-reading
    Files.delete(logDir.resolve(f"${1L}%020d.checkpoint.${2}%010d.${3}%010d.parquet"))
    val e = intercept[IllegalArgumentException] { DeltaRead.snapshot(t) }
    assert(e.getMessage.contains("part"))
  }

  test("re-adding a removed path clears its tombstone") {
    val t = tbl()
    DeltaWrite.write(base, t, Seq("p"))
    DeltaWrite.write(Seq((10L, "a", "n")).toDF("id", "p", "v"), t,
      mode = "overwritePartitions")
    assert(DeltaRead.snapshot(t).tombstones.nonEmpty)
    // full overwrite re-adds fresh files and tombstones the rest; a
    // subsequent checkpoint+read stays consistent
    DeltaWrite.write(base, t, mode = "overwrite")
    DeltaWrite.checkpoint(spark, t)
    assert(DeltaRead.read(spark, t).count() == 4)
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.map(_.path).toSet.intersect(
      snap.tombstones.map(_.path).toSet).isEmpty,
      "a path must never be both live and tombstoned")
  }

  test("distributed write: multi-partition input yields multiple files per hive partition") {
    val t = tbl()
    val df = spark.range(0, 1000, 1, 8)
      .select($"id", (($"id" % 2).cast("string")).as("p"), lit("v").as("v"))
    DeltaWrite.write(df, t, Seq("p"))
    val snap = DeltaRead.snapshot(t)
    val perPart = snap.files.groupBy(_.partitionValues("p")).map(_._2.size)
    assert(perPart.forall(_ > 1),
      s"each hive partition should hold several executor-written files, got $perPart")
    assert(DeltaRead.read(spark, t).count() == 1000)
  }

  test("vacuum removes tombstoned data files and superseded DV files, head intact") {
    val t = tbl()
    // coalesce(1): ONE file per partition, so the second delete provably
    // supersedes the first file's DV instead of landing in a sibling file
    DeltaWrite.write(base.coalesce(1), t, Seq("p"))
    DeltaWrite.write(Seq((10L, "a", "n")).toDF("id", "p", "v"), t,
      mode = "overwritePartitions")                 // tombstones the a-file
    DeltaWrite.deleteWhere(spark, t, $"id" === 3L)  // DV #1 on the b-file
    DeltaWrite.deleteWhere(spark, t, $"id" === 4L)  // DV #2 supersedes it
    val headBefore = DeltaRead.read(spark, t).as[(Long, String, String)]
      .collect().toSet
    val snap = DeltaRead.snapshot(t)
    val tombPaths = snap.tombstones.map(_.path)
    assert(tombPaths.nonEmpty)
    val dvFiles = Files.list(Paths.get(t)).iterator().asScala
      .count(_.getFileName.toString.startsWith("deletion_vector_"))
    assert(dvFiles == 2, s"expected 2 DV files before vacuum, got $dvFiles")
    val removed = DeltaWrite.vacuum(spark, t)
    assert(removed == tombPaths.size + 1,
      s"want ${tombPaths.size} tombstoned data files + 1 superseded DV, got $removed")
    tombPaths.foreach(p => assert(!Files.exists(Paths.get(t).resolve(p)),
      s"tombstoned $p must be gone"))
    assert(Files.list(Paths.get(t)).iterator().asScala
      .count(_.getFileName.toString.startsWith("deletion_vector_")) == 1,
      "only the CURRENT DV file survives")
    // head read byte-identical after vacuum
    assert(DeltaRead.read(spark, t).as[(Long, String, String)]
      .collect().toSet == headBefore)
    // idempotent
    assert(DeltaWrite.vacuum(spark, t) == 0)
  }

  test("interop both ways: DeltaRead reads fixture-authored logs and write-path logs identically") {
    // fixture-authored table appended to by the write path
    val t = tbl()
    DeltaFixture.commit(spark, t, base.schema, Seq("p"), 0L,
      Seq("a", "b").map(p => Map("p" -> p) -> base.filter($"p" === p)))
    DeltaWrite.write(Seq((7L, "e", "n")).toDF("id", "p", "v"), t)
    assert(DeltaRead.read(spark, t).count() == 5)
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
