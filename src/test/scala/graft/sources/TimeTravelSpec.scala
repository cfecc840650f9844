package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time-travel reads over both interop formats: any retained historical
  * version/snapshot reconstructs exactly, overwrites and MoR deletes
  * included; unreachable history fails loudly. */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(p: String): String =
    Files.createTempDirectory(p).resolve("t").toString

  test("Delta: versions replay exactly, including pre-overwrite and pre-DV states") {
    val t = tbl("graft_tt_delta")
    DeltaWrite.write(spark.range(0, 10).select($"id"), t)                 // v0
    DeltaWrite.write(spark.range(10, 20).select($"id"), t)                // v1
    DeltaWrite.deleteWhere(spark, t, col("id") < 5)                       // v2 (DV)
    DeltaWrite.write(spark.range(100, 103).select($"id"), t,
      mode = "overwrite")                                                 // v3
    assert(DeltaRead.readAt(spark, t, 0).count() == 10)
    assert(DeltaRead.readAt(spark, t, 1).count() == 20)
    assert(DeltaRead.readAt(spark, t, 2).count() == 15,
      "v2 must apply the deletion vector")
    assert(DeltaRead.readAt(spark, t, 2).agg(min($"id")).head().getLong(0) == 5L)
    assert(DeltaRead.readAt(spark, t, 3).count() == 3)
    assert(DeltaRead.read(spark, t).count() == 3)
    val e = intercept[IllegalArgumentException] { DeltaRead.readAt(spark, t, 9) }
    assert(e.getMessage.contains("version 9"))
  }

  test("Delta: a checkpoint NEWER than the target version is not used") {
    val t = tbl("graft_tt_cp")
    DeltaWrite.write(spark.range(0, 10).select($"id"), t)   // v0
    DeltaWrite.write(spark.range(10, 20).select($"id"), t)  // v1
    DeltaWrite.checkpoint(spark, t)                         // cp @ v1
    assert(DeltaRead.readAt(spark, t, 0).count() == 10,
      "v0 must replay from commits, not the v1 checkpoint")
    // but once the pre-checkpoint commits are vacuumed, v0 is gone — loudly
    Files.delete(java.nio.file.Paths.get(t, "_delta_log", f"${0L}%020d.json"))
    val e = intercept[IllegalArgumentException] { DeltaRead.readAt(spark, t, 0) }
    assert(e.getMessage.contains("version 0"))
  }

  test("Delta readAppends: exactly the version range's rows; rewrites fail loudly") {
    val t = tbl("graft_tt_appends")
    DeltaWrite.write(spark.range(0, 10).select($"id"), t)   // v0
    DeltaWrite.write(spark.range(10, 20).select($"id"), t)  // v1
    DeltaWrite.write(spark.range(20, 25).select($"id"), t)  // v2
    def ids(from: Long, to: Long): Set[Long] =
      DeltaRead.readAppends(spark, t, from, to).as[Long].collect().toSet
    assert(ids(0, 2) == (10L until 25L).toSet)
    assert(ids(1, 2) == (20L until 25L).toSet)
    assert(ids(2, 2) == Set.empty[Long])
    DeltaWrite.deleteWhere(spark, t, col("id") < 5)          // v3: DV
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readAppends(spark, t, 0, 3)
    }
    // the DV commit carries remove+re-add actions; either guard is loud
    assert(e.getMessage.contains("remove action") ||
      e.getMessage.contains("deletion vector"))
    // ranges before the rewrite stay readable
    assert(ids(0, 2).size == 15)
  }

  test("Iceberg: snapshots resolve by id; expired ids fail loudly") {
    val t = tbl("graft_tt_ice")
    IcebergWrite.write(spark.range(0, 10).select($"id"), t)               // s1
    IcebergWrite.write(spark.range(10, 20).select($"id"), t)              // s2
    IcebergWrite.write(spark.range(100, 103).select($"id"), t,
      mode = "overwrite")                                                 // s3
    assert(IcebergRead.readAt(spark, t, 1L).count() == 10)
    assert(IcebergRead.readAt(spark, t, 2L).count() == 20)
    assert(IcebergRead.readAt(spark, t, 3L).count() == 3)
    val e = intercept[IllegalArgumentException] { IcebergRead.readAt(spark, t, 42L) }
    assert(e.getMessage.contains("42"))
  }

  test("Iceberg: historical snapshot excludes deletes committed after it") {
    val t = tbl("graft_tt_ice_del")
    val df = spark.range(0, 10).select($"id", lit("v").as("v")).orderBy("id")
    val files = IcebergFixture.snapshot(spark, t, df.schema, Nil, 1L,
      Seq(Map.empty[String, String] -> df))
    IcebergFixture.positionDeleteSnapshot(spark, t, 2L, Seq(files.head -> 0L))
    assert(IcebergRead.readAt(spark, t, 1L).count() == 10,
      "snapshot 1 predates the delete — full file visible")
    assert(IcebergRead.readAt(spark, t, 2L).count() == 9)
  }
}
