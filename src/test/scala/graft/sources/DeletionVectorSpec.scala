package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the deletion-vector channel: the binary codec (base85,
  * RoaringBitmapArray portable format incl. foreign run containers, DV
  * file framing with CRC), the merge-on-read `deleteWhere` write path,
  * re-delete merging, checkpoint survival, and row accounting. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  // ---- codec -----------------------------------------------------------

  test("base85 round-trips a UUID in 20 chars with the RFC1924 alphabet") {
    val uuid = java.util.UUID.fromString("12345678-9abc-def0-1122-334455667788")
    val enc = DeletionVectors.encodeUuid(uuid)
    assert(enc.length == 20)
    assert(DeletionVectors.relativePathOf(enc) ==
      s"deletion_vector_$uuid.bin")
    // optional random prefix before the 20-char uuid becomes a directory
    assert(DeletionVectors.relativePathOf("xy" + enc) ==
      s"xy/deletion_vector_$uuid.bin")
  }

  test("roaring round-trip: array, bitmap (>4096), and 64-bit buckets") {
    val idx = (0L until 5000L).toArray ++            // bitmap container
      Array(70000L, 70002L, 131071L) ++              // second 16-bit key, array
      Array((1L << 32) + 7L, (1L << 32) + 9L)        // second 32-bit bucket
    val bytes = DeletionVectors.serialize(idx)
    assert(DeletionVectors.deserialize(bytes).sorted.sameElements(idx.sorted))
  }

  test("run containers from foreign engines decode") {
    // hand-craft: magic + 1 bitmap (key 0) with run cookie, 1 container,
    // key=3, card=11, one run [5, 5+10]
    val bm = ByteBuffer.allocate(4 + 1 + 4 + 2 + 4 + 2 + 4).order(ByteOrder.LITTLE_ENDIAN)
    bm.putInt(12347 | (0 << 16)) // SERIAL_COOKIE, containerCount-1 = 0
    bm.put(1.toByte)             // run flag bitset: container 0 is a run
    bm.putShort(3.toShort)       // key
    bm.putShort(10.toShort)      // cardinality - 1
    // containerCount < 4 and hasRun → no offset header
    bm.putShort(1.toShort)       // nRuns
    bm.putShort(5.toShort)       // start
    bm.putShort(10.toShort)      // length
    val inner = java.util.Arrays.copyOf(bm.array(), bm.position())
    val outer = ByteBuffer.allocate(4 + 8 + 4 + inner.length).order(ByteOrder.LITTLE_ENDIAN)
    outer.putInt(1681511377); outer.putLong(1L); outer.putInt(0); outer.put(inner)
    val got = DeletionVectors.deserialize(outer.array())
    val base = 3L << 16
    assert(got.toSeq == (5 to 15).map(v => base + v))
  }

  test("DV file framing: version byte, size-prefixed CRC-checked vectors, offsets") {
    val d1 = DeletionVectors.serialize(Array(1L, 5L, 9L))
    val d2 = DeletionVectors.serialize(Array(0L, 2L))
    val f = Files.createTempDirectory("graft_dv").resolve("dv.bin")
    val offs = DeletionVectors.writeFile(f, Seq(d1, d2))
    assert(offs.head == 1, "first vector sits right after the version byte")
    assert(DeletionVectors.readAt(f, offs(0), d1.length).sameElements(d1))
    assert(DeletionVectors.readAt(f, offs(1), d2.length).sameElements(d2))
    // corrupt one data byte → CRC must trip
    val raw = Files.readAllBytes(f)
    raw(offs(0) + 4) = (raw(offs(0) + 4) ^ 0x1).toByte
    Files.write(f, raw)
    val e = intercept[IllegalArgumentException] {
      DeletionVectors.readAt(f, offs(0), d1.length)
    }
    assert(e.getMessage.contains("CRC"))
  }

  test("inline (storageType=i) descriptors resolve via padded base85") {
    val data = DeletionVectors.serialize(Array(3L, 7L, 11L))
    val enc = DeletionVectors.base85Encode(data)
    val d = DeletionVectors.Descriptor("i", enc, None, data.length, 3L)
    val back = DeletionVectors.resolve(Paths.get("/nonexistent"), d)
    assert(back.sameElements(data))
    assert(DeletionVectors.deserialize(back).toSeq == Seq(3L, 7L, 11L))
  }

  // ---- merge-on-read delete path --------------------------------------

  private def tbl(): String =
    Files.createTempDirectory("graft_dv_delete").resolve("t").toString

  test("deleteWhere suppresses rows without rewriting data files") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 1000, 1, 4)
      .select($"id", ($"id" % 5).cast("string").as("grp")), t)
    val dataFilesBefore = DeltaRead.snapshot(t).files.map(_.path).toSet
    val v = DeltaWrite.deleteWhere(spark, t, col("id") % 10 === 0)
    assert(v == 1L)
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.map(_.path).toSet == dataFilesBefore,
      "MoR delete must not rewrite or drop data files")
    assert(snap.files.forall(_.deletionVector.nonEmpty))
    assert(snap.files.flatMap(_.deletionVector).map(_.cardinality).sum == 100L)
    assert(snap.protocol.minReaderVersion == 3 &&
      snap.protocol.readerFeatures.contains("deletionVectors"))
    val back = DeltaRead.read(spark, t)
    assert(back.count() == 900L)
    assert(back.filter($"id" % 10 === 0).count() == 0L)
  }

  test("re-delete MERGES vectors (never resurrects, never double-counts)") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 100, 1, 2).select($"id"), t)
    DeltaWrite.deleteWhere(spark, t, col("id") < 10)
    DeltaWrite.deleteWhere(spark, t, col("id") < 20) // overlaps the first
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.flatMap(_.deletionVector).map(_.cardinality).sum == 20L)
    assert(DeltaRead.read(spark, t).count() == 80L)
    assert(DeltaRead.read(spark, t).agg(min($"id")).head().getLong(0) == 20L)
  }

  test("empty delete is a no-op, not an empty commit") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 10).select($"id"), t)
    val v = DeltaWrite.deleteWhere(spark, t, col("id") > 1000)
    assert(v == 0L, "head version unchanged")
    assert(DeltaRead.read(spark, t).count() == 10L)
  }

  test("checkpoint preserves deletion vectors and the upgraded protocol") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 500, 1, 2).select($"id"), t)
    DeltaWrite.deleteWhere(spark, t, col("id") % 7 === 0)
    val before = DeltaRead.read(spark, t).count()
    DeltaWrite.checkpoint(spark, t)
    // truncate the JSON history below the checkpoint to prove resume
    val logDir = Paths.get(t, "_delta_log")
    Seq(0L, 1L).foreach(v =>
      Files.deleteIfExists(logDir.resolve(f"$v%020d.json")))
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.forall(_.deletionVector.nonEmpty))
    assert(snap.protocol.minReaderVersion == 3 &&
      snap.protocol.readerFeatures.contains("deletionVectors"))
    assert(DeltaRead.read(spark, t).count() == before)
  }

  test("delete + append interleave: DV files and fresh files coexist") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 100).select($"id"), t)
    DeltaWrite.deleteWhere(spark, t, col("id") < 50)
    DeltaWrite.write(spark.range(1000, 1100).select($"id"), t)
    val back = DeltaRead.read(spark, t)
    assert(back.count() == 150L)
    // a second delete spanning both vintages merges into the old DV and
    // creates a new one for the appended file
    DeltaWrite.deleteWhere(spark, t, col("id") % 2 === 1)
    assert(DeltaRead.read(spark, t).count() == 75L)
  }
}
