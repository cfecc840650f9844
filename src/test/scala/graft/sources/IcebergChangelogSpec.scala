package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of IcebergRead.readChanges: per-snapshot classification by
  * the declared summary.operation (append → inserts, delete → exactly
  * the suppressed rows, overwrite → parent-visible removed rows +
  * inserts, replace → silence), equality-delete suppression with
  * sequence gating, and range/boundary semantics shared with
  * readAppends. */
class IcebergChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_ice_changes").resolve("t").toString

  private def rows(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  private def feed(t: String, from: Long, to: Long): Map[(Long, String), Set[Long]] =
    IcebergRead.readChanges(spark, t, from, to)
      .select(col("_snapshot_id"), col("_change_type"), col("id"))
      .as[(Long, String, Long)].collect()
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).toSet).toMap

  test("append inserts, MoR delete emits exactly the suppressed rows") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 10), t)                   // s1
    IcebergWrite.write(rows(11 to 14), t)                  // s2
    IcebergWrite.deleteWhere(spark, t, col("id") % 3 === 0) // s3
    val f = feed(t, 0L, 3L)
    assert(f((1L, "insert")) == (1L to 10L).toSet)
    assert(f((2L, "insert")) == (11L to 14L).toSet)
    assert(f((3L, "delete")) == Set(3L, 6L, 9L, 12L))
    assert(f.size == 3)
    // a second delete must not re-emit already-suppressed rows
    IcebergWrite.deleteWhere(spark, t, col("id") % 2 === 0) // s4
    assert(feed(t, 3L, 4L) == Map((4L, "delete") -> Set(2L, 4L, 8L, 10L, 14L)))
  }

  test("replace is silent; overwrite emits parent-visible deletes + inserts") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 8), t)                     // s1
    IcebergWrite.deleteWhere(spark, t, col("id") <= 2)      // s2
    IcebergWrite.rewriteDataFiles(spark, t)                 // s3: replace
    IcebergWrite.write(rows(100 to 101), t, mode = "overwrite") // s4
    val f = feed(t, 2L, 4L)
    assert(!f.keySet.exists(_._1 == 3L)) // compaction contributes nothing
    // the overwrite deletes what was VISIBLE (1,2 already suppressed)
    assert(f((4L, "delete")) == (3L to 8L).toSet)
    assert(f((4L, "insert")) == Set(100L, 101L))
  }

  test("equality deletes: sequence-gated suppression in the feed") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 6), t)                     // s1
    IcebergFixture.equalityDeleteSnapshot(spark, t, 2L, Seq("s"),
      Seq(("v2", 0), ("v5", 0)).toDF("s", "x"))             // s2
    IcebergWrite.write(rows(20 to 21), t)                   // s3
    val f = feed(t, 0L, 3L)
    assert(f((2L, "delete")) == Set(2L, 5L))
    assert(f((3L, "insert")) == Set(20L, 21L)) // newer seq: not suppressed
    // head agrees with the feed's net effect
    assert(IcebergRead.read(spark, t).count() == 6 - 2 + 2)
  }

  test("missing/unknown operation and expired ranges reject loudly") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 3), t)
    intercept[IllegalArgumentException] {
      IcebergRead.readChanges(spark, t, 5L, 5L)
    }
  }
}
