package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the distributed Iceberg write path: snapshot numbering,
  * mode liveness semantics, data files retaining partition source columns
  * (the spec's layout requirement), record counts in the manifest, loud
  * null-partition rejection, and mutual interop with fixture-authored
  * tables. */
class IcebergWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_ice_write").resolve("t").toString

  private val base = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"),
    (4L, "b", "y")).toDF("id", "p", "v")

  test("append snapshots stack; data files contain the partition column") {
    val t = tbl()
    assert(IcebergWrite.write(base, t, Seq("p")) == 1L)
    assert(IcebergWrite.write(Seq((5L, "c", "z")).toDF("id", "p", "v"), t) == 2L)
    val snap = IcebergRead.snapshot(t)
    assert(snap.snapshotId == 2L && snap.identityPartitionCols == Seq("p"))
    val rows = IcebergRead.read(spark, t).as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"),
      (4L, "b", "y"), (5L, "c", "z")))
    // the spec's layout contract: p is IN the files, readable without any
    // partition-schema reconstruction
    val raw = spark.read.parquet(snap.files.head.path)
    assert(raw.columns.contains("p"))
  }

  test("overwrite tombstones all; overwritePartitions only the written tuples") {
    val t = tbl()
    IcebergWrite.write(base, t, Seq("p"))
    IcebergWrite.write(Seq((10L, "a", "new")).toDF("id", "p", "v"), t,
      mode = "overwritePartitions")
    val afterDyn = IcebergRead.read(spark, t).as[(Long, String, String)].collect().toSet
    assert(afterDyn == Set((10L, "a", "new"), (3L, "b", "x"), (4L, "b", "y")))
    IcebergWrite.write(Seq((9L, "z", "w")).toDF("id", "p", "v"), t,
      mode = "overwrite")
    val afterAll = IcebergRead.read(spark, t).as[(Long, String, String)].collect().toSet
    assert(afterAll == Set((9L, "z", "w")))
  }

  test("manifest record counts come from the footers") {
    val t = tbl()
    IcebergWrite.write(base, t, Seq("p"))
    // fixture's manifest reader surfaces only path/pv/size; read the avro
    // manifest directly for record_count
    val metaDir = java.nio.file.Paths.get(t, "metadata")
    val manifest = java.nio.file.Files.list(metaDir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("m-")).toSeq.sorted.head
    val reader = org.apache.avro.file.DataFileReader.openReader(
      manifest.toFile,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val counts = try reader.iterator().asScala.map(e =>
      e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        .get("record_count").asInstanceOf[Long]).toSeq
    finally reader.close()
    assert(counts.sum == 4L && counts.forall(_ > 0L))
  }

  test("carried-forward manifest entries keep their ORIGINAL record counts") {
    val t = tbl()
    IcebergWrite.write(base, t, Seq("p"))            // snapshot 1: 4 rows
    IcebergWrite.write(Seq((5L, "c", "z")).toDF("id", "p", "v"), t) // snap 2
    // snapshot 2's manifest re-lists snapshot 1's files as status=0
    // entries; the spec requires the ACTUAL record count there (real
    // engines use it for count(*) pushdown), not a placeholder 0
    val snap = IcebergRead.snapshot(t)
    assert(snap.files.map(_.recordCount).sum == 5L,
      s"total record_count must be 5, got ${snap.files.map(f => f.path -> f.recordCount)}")
    assert(snap.files.forall(_.recordCount > 0L),
      "no carried-forward entry may report record_count=0")
  }

  test("schema mismatch on append is rejected loudly") {
    val t = tbl()
    IcebergWrite.write(base, t, Seq("p"))
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.write(Seq((1L, "a", 5)).toDF("id", "p", "v"), t)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("NULL partition values round-trip as null tuples (r14: supported)") {
    val t = tbl()
    val withNull = Seq((1L, Some("a"), "x"), (2L, None, "y")).toDF("id", "p", "v")
    IcebergWrite.write(withNull, t, Seq("p"))
    val snap = IcebergRead.snapshot(t)
    assert(snap.files.exists(_.partitionValues.get("p").contains(null)),
      "null-source rows must land in a null-tuple file")
    assert(IcebergRead.read(spark, t)
      .select("id", "p").as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("a")), (2L, None)))
  }

  test("partition values with path metacharacters stay hive-escaped in the layout") {
    val t = tbl()
    // '/' would nest an extra directory and '..' could escape the table
    // root if the target path were composed from the UNESCAPED value
    val df = Seq((1L, "x/y", "a"), (2L, "..", "b")).toDF("id", "p", "v")
    IcebergWrite.write(df, t, Seq("p"))
    val snap = IcebergRead.snapshot(t)
    val root = java.nio.file.Paths.get(t).toRealPath()
    snap.files.foreach { f =>
      val p = java.nio.file.Paths.get(f.path).toRealPath()
      assert(p.startsWith(root.resolve("data")),
        s"data file $p escaped the table's data/ dir")
      // exactly data/<c>=<v>/<file>: one partition directory level
      assert(root.resolve("data").relativize(p).getNameCount == 2,
        s"unescaped value nested extra directories: $p")
    }
    // values round-trip unescaped through the manifest
    assert(snap.files.map(_.partitionValues("p")).toSet == Set("x/y", ".."))
    val back = IcebergRead.read(spark, t).select($"id", $"p")
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "x/y"), (2L, "..")))
  }

  test("distributed write: multi-partition input yields multiple files per tuple") {
    val t = tbl()
    val df = spark.range(0, 1000, 1, 8)
      .select($"id", ($"id" % 2).cast("string").as("p"), lit("v").as("v"))
    IcebergWrite.write(df, t, Seq("p"))
    val snap = IcebergRead.snapshot(t)
    val perTuple = snap.files.groupBy(_.partitionValues("p")).map(_._2.size)
    assert(perTuple.forall(_ > 1),
      s"each tuple should hold several executor-written files, got $perTuple")
    assert(IcebergRead.read(spark, t).count() == 1000)
  }

  test("interop: write path appends to a fixture-authored table") {
    val t = tbl()
    IcebergFixture.snapshot(spark, t, base.schema, Seq("p"), 1L,
      Seq("a", "b").map(p => Map("p" -> p) -> base.filter($"p" === p)))
    IcebergWrite.write(Seq((7L, "e", "n")).toDF("id", "p", "v"), t)
    assert(IcebergRead.read(spark, t).count() == 5)
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
