package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 protocol-conformance contracts:
  *  - dataChange=false actions (OPTIMIZE/compaction) are invisible to
  *    every incremental consumer — readAppends, readChangeFeed, DeltaTail;
  *  - checkpoints retain setTransaction markers and store pv/stats keys
  *    PHYSICAL on column-mapped tables;
  *  - deleteWhere writes its DV files on executors (one per shuffle
  *    partition, descriptors only on the driver) and, when converting a
  *    legacy protocol, enumerates the implied legacy features;
  *  - with delta.enableChangeDataFeed=true, deleteWhere emits cdc change
  *    data so its DV commits ARE readable as a feed. */
class DeltaProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_proto").resolve("t").toString

  test("compaction commits (dataChange=false) are invisible to incremental consumers") {
    val t = tbl()
    val schema = Seq((1L, "x")).toDF("id", "v").schema
    // v0: two data files
    val v0 = DeltaFixture.commit(spark, t, schema, Nil, 0L, Seq(
      Map.empty[String, String] -> Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      Map.empty[String, String] -> Seq((3L, "c")).toDF("id", "v")))
    // v1: OPTIMIZE — same 3 rows combined into one file, dataChange=false
    DeltaFixture.compactionCommit(spark, t, schema, Nil, 1L, Map.empty,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), v0)
    // v2: a real append
    DeltaFixture.commit(spark, t, schema, Nil, 2L,
      Seq(Map.empty[String, String] -> Seq((4L, "d")).toDF("id", "v")))

    // head state unchanged by the compaction
    assert(DeltaRead.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // appends since v0 = exactly v2's rows; the rearrangement contributes
    // nothing (the old behavior either failed on the remove or
    // double-counted the re-added rows)
    assert(DeltaRead.readAppends(spark, t, 0L, 2L)
      .as[(Long, String)].collect().toSet == Set((4L, "d")))
    // the change feed over the same range: one insert, no delete rows
    val feed = DeltaRead.readChangeFeed(spark, t, 0L, 2L)
      .select($"id", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(feed == Set((4L, "insert", 2L)), s"got $feed")
    // the streaming tail drains all three versions without failing and
    // sees only the two dataChange batches
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = graft.streaming.DeltaTail.stream(spark, t,
      s"$t/../cp_opt", (_, v) => seen.synchronized { seen += v: Unit })
    try { q.processAllAvailable(); q.stop() }
    finally if (q.isActive) q.stop()
    assert(seen.toSeq == Seq(0L, 2L), s"got $seen")
  }

  test("checkpoint retains txn markers; snapshot replays them") {
    val t = tbl()
    DeltaWrite.write(Seq((1L, "a")).toDF("id", "v"), t)          // v0
    DeltaFixture.txnCommit(t, 1L, "writer-app", 41L)             // v1
    DeltaFixture.txnCommit(t, 2L, "writer-app", 42L)             // v2: latest wins
    DeltaFixture.txnCommit(t, 3L, "other-app", 7L)               // v3
    assert(DeltaRead.snapshot(t).txns ==
      Map("writer-app" -> 42L, "other-app" -> 7L))
    DeltaWrite.checkpoint(spark, t)
    // drop every JSON commit: replay must now resume from the checkpoint
    // alone — losing the txn markers here is the double-commit bug
    val logDir = Paths.get(t, "_delta_log")
    val listing = Files.list(logDir)
    try listing.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .toSeq.foreach(Files.delete)
    finally listing.close()
    val snap = DeltaRead.snapshot(t)
    assert(snap.txns == Map("writer-app" -> 42L, "other-app" -> 7L),
      s"checkpoint dropped txn actions: ${snap.txns}")
    assert(snap.files.size == 1 && snap.version == 3L)
  }

  test("checkpoint stores pv and stats keys PHYSICAL on a column-mapped table") {
    val t = tbl()
    val schema = Seq((1L, "a")).toDF("id", "p").schema
    val mapping = Map("id" -> "col-aaaa", "p" -> "col-bbbb")
    DeltaFixture.commitMapped(spark, t, schema, Seq("p"), 0L, mapping,
      Seq(Map("p" -> "a") -> Seq((1L, "a"), (2L, "a")).toDF("id", "p")))
    DeltaWrite.checkpoint(spark, t)
    val cp = spark.read.parquet(
      Paths.get(t, "_delta_log").resolve(f"${0L}%020d.checkpoint.parquet").toString)
    val pvKeys = cp.filter(col("add").isNotNull)
      .select(explode(map_keys(col("add.partitionValues"))))
      .as[String].collect().toSet
    assert(pvKeys == Set("col-bbbb"),
      s"checkpoint pv keys must be physical, got $pvKeys")
    // a conformant replay of this checkpoint still yields LOGICAL keys
    // (normalization happens at replay, exactly like JSON commits)
    val logDir = Paths.get(t, "_delta_log")
    Files.delete(logDir.resolve(f"${0L}%020d.json"))
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.forall(_.partitionValues.keySet == Set("p")),
      s"replayed pv keys must be logical")
    assert(DeltaRead.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "a")))
  }

  test("deleteWhere: DV files written per shuffle partition, executor-side; round-trips") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 4000).select($"id",
      ($"id" % 40).as("bucket")).repartition(16), t)
    // AQE would (correctly) coalesce this tiny shuffle to one partition
    // and one DV file; pin it off so the spec can SEE the per-partition
    // sharding that matters at real delete cardinalities
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    val v = try DeltaWrite.deleteWhere(spark, t, col("id") % 10 === 0)
    finally spark.conf.set(coalesceKey, prev)
    assert(v == 1L)
    assert(DeltaRead.read(spark, t).count() == 3600)
    // every descriptor resolves to an existing DV file; more than one DV
    // file exists (touched files spread over shuffle partitions — the
    // driver never funneled the bitmaps through a single write)
    val snap = DeltaRead.snapshot(t)
    val dvFiles = snap.files.flatMap(_.deletionVector)
      .map(d => DeletionVectors.relativePathOf(d.pathOrInlineDv)).distinct
    assert(dvFiles.nonEmpty &&
      dvFiles.forall(p => Files.exists(Paths.get(t).resolve(p))))
    assert(dvFiles.size > 1,
      s"16 touched files should shard across >1 DV files, got ${dvFiles.size}")
    // a second delete merges per-file bitmaps instead of resurrecting
    DeltaWrite.deleteWhere(spark, t, col("id") % 10 === 1)
    assert(DeltaRead.read(spark, t).count() == 3200)
  }

  test("deleteWhere enumerates implied legacy features when converting the protocol") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 10).select($"id"), t) // protocol (1, 2)
    DeltaWrite.deleteWhere(spark, t, $"id" < 2)
    val p = DeltaRead.snapshot(t).protocol
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.contains("deletionVectors"))
    // legacy writer version 2 implied appendOnly + invariants — a strict
    // engine stops enforcing them unless the conversion lists them
    assert(Set("appendOnly", "invariants", "deletionVectors")
      .subsetOf(p.writerFeatures.toSet), s"got ${p.writerFeatures}")
    assert(!p.readerFeatures.contains("columnMapping"),
      "legacy reader version 1 implies no reader features")
  }

  test("CDF-enabled deleteWhere emits change data; the feed serves the DV commit") {
    val t = tbl()
    DeltaWrite.write(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p"),
      t, Seq("p"))                                                   // v0
    DeltaWrite.setProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true"))                   // v1
    val v = DeltaWrite.deleteWhere(spark, t, $"id" <= 2)             // v2
    assert(v == 2L)
    assert(DeltaRead.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((3L, "b")))
    // the DV commit is now consumable as changes (was a loud reject)
    val feed = DeltaRead.readChangeFeed(spark, t, 1L, 2L)
      .select($"id", $"p", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed == Set((1L, "a", "delete", 2L), (2L, "a", "delete", 2L)),
      s"got $feed")
    // change files live under _change_data/ with hive partition dirs
    assert(Files.isDirectory(Paths.get(t, "_change_data")))
    // full-range feed composes synthesis (v0 inserts) + cdc (v2 deletes);
    // the property commit (v1) contributes nothing
    assert(DeltaRead.readChangeFeed(spark, t, -1L, 2L).count() == 5)
  }

  test("Delta mergeSchema: appended column lands in the log; old files read as NULL") {
    val t = tbl()
    DeltaWrite.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)        // v0
    DeltaWrite.setProperties(spark, t, Map("graft.marker" -> "yes"))      // v1
    // default stays a loud reject — evolution is opt-in
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.write(Seq((3L, "c", 7L)).toDF("id", "v", "extra"), t)
    }
    assert(e.getMessage.contains("mergeSchema"))
    DeltaWrite.write(Seq((3L, "c", 7L)).toDF("id", "v", "extra"), t,
      mergeSchema = true)                                                 // v2
    val snap = DeltaRead.snapshot(t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(snap.configuration.get("graft.marker").contains("yes"),
      "evolution must not wipe table properties")
    assert(DeltaRead.read(spark, t).select($"id", $"v", $"extra")
      .as[(Long, String, Option[Long])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(7L))))
    // dropping/retyping is never evolution
    intercept[IllegalArgumentException] {
      DeltaWrite.write(Seq((4L, 9L)).toDF("id", "extra"), t, mergeSchema = true)
    }
  }

  test("Iceberg mergeSchema: appended column, stable field ids, old files as NULL") {
    val t = tbl()
    IcebergWrite.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    IcebergWrite.write(Seq((3L, "c", 7L)).toDF("id", "v", "extra"), t,
      mergeSchema = true)
    val snap = IcebergRead.snapshot(t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(snap.fieldIdToName.get(1).contains("id") &&
      snap.fieldIdToName.get(3).contains("extra"),
      s"appending must keep existing field ids stable, got ${snap.fieldIdToName}")
    assert(IcebergRead.read(spark, t).select($"id", $"v", $"extra")
      .as[(Long, String, Option[Long])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(7L))))
    // non-appended (reordered/inserted) column sets are rejected
    intercept[IllegalArgumentException] {
      IcebergWrite.write(Seq((4L, 9L, "d")).toDF("id", "extra", "v"), t,
        mergeSchema = true)
    }
  }

  test("streamChanges tails across appends AND a DV delete as change batches") {
    val t = tbl()
    DeltaWrite.write(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), t, Seq("p")) // v0
    DeltaWrite.setProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true"))                           // v1
    DeltaWrite.write(Seq((3L, "a")).toDF("id", "p"), t)                      // v2
    DeltaWrite.deleteWhere(spark, t, $"id" === 1L)                           // v3
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Set[(Long, String, String)])]()
    val q = graft.streaming.DeltaTail.streamChanges(spark, t, s"$t/../cp_cdf",
      (df, v) => seen.synchronized {
        seen += ((v, df.select($"id", $"p", $"_change_type")
          .as[(Long, String, String)].collect().toSet)): Unit
      })
    try { q.processAllAvailable(); q.stop() }
    finally if (q.isActive) q.stop()
    assert(seen.map(_._1).toSeq == Seq(0L, 2L, 3L), s"got ${seen.map(_._1)}")
    assert(seen.head._2 == Set((1L, "a", "insert"), (2L, "b", "insert")))
    assert(seen(1)._2 == Set((3L, "a", "insert")))
    assert(seen(2)._2 == Set((1L, "a", "delete")),
      s"the DV delete must arrive as a change batch, got ${seen(2)._2}")
  }
}
