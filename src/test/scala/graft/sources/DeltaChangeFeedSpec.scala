package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the Change Data Feed read: cdc actions are the commit's
  * AUTHORITATIVE change set (adds/removes in the same commit are layout,
  * not changes); commits without cdc actions synthesize inserts from adds
  * and deletes from removes (partition values restored through the
  * forward replay); DV commits without cdc fail loudly. */
class DeltaChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_cdf").resolve("t").toString

  test("synthesized feed: appends are inserts, overwrites are delete+insert") {
    val t = tbl()
    DeltaWrite.write(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), t, Seq("p")) // v0
    DeltaWrite.write(Seq((3L, "a")).toDF("id", "p"), t)                      // v1
    DeltaWrite.write(Seq((9L, "a")).toDF("id", "p"), t,
      mode = "overwritePartitions")                                          // v2
    val feed = DeltaRead.readChangeFeed(spark, t, -1, 2)
      .select($"id", $"p", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (3L, "a", "insert", 1L),
      // v2 dynamic-overwrites partition a: old a-rows deleted, new inserted
      (1L, "a", "delete", 2L), (3L, "a", "delete", 2L),
      (9L, "a", "insert", 2L)))
    // range semantics: (1, 2] sees only v2's changes
    assert(DeltaRead.readChangeFeed(spark, t, 1, 2).count() == 3)
  }

  test("cdc actions override synthesis for their commit") {
    val t = tbl()
    val s1 = DeltaFixture.commit(spark, t,
      Seq((1L, "a"), (2L, "a")).toDF("id", "p").schema, Seq("p"), 0L,
      Seq(Map("p" -> "a") -> Seq((1L, "a"), (2L, "a")).toDF("id", "p")))
    // v1: delete id=1 described by a CDC file; the remove also rewrites
    // the partition file (copy-on-write) — the feed must NOT synthesize
    // a delete of id=2 from the remove, the cdc file is authoritative
    DeltaFixture.cdcCommit(spark, t, 1L, Seq("p"),
      cdc = Seq(Map("p" -> "a") ->
        Seq((1L, "a", "delete")).toDF("id", "p", "_change_type")),
      removes = s1,
      adds = Seq(Map("p" -> "a") -> Seq((2L, "a")).toDF("id", "p")))
    assert(DeltaRead.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((2L, "a")), "head state: id=1 gone, id=2 rewritten")
    val v1feed = DeltaRead.readChangeFeed(spark, t, 0, 1)
      .select($"id", $"_change_type").as[(Long, String)].collect().toSet
    assert(v1feed == Set((1L, "delete")),
      s"cdc file is the authoritative change set, got $v1feed")
  }

  test("a DV commit without cdc actions fails the feed loudly") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 10).select($"id"), t)
    DeltaWrite.deleteWhere(spark, t, col("id") < 3)
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readChangeFeed(spark, t, -1, 1)
    }
    assert(e.getMessage.contains("deletion vector"))
    // ranges that avoid the DV commit still read
    assert(DeltaRead.readChangeFeed(spark, t, -1, 0).count() == 10)
  }
}
