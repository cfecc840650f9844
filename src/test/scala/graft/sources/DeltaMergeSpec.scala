package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of DeltaWrite.merge: upsert semantics (matched = update all
  * columns, unmatched = insert), untouched files survive byte-identical,
  * deletion-vector state composes (suppressed rows neither match nor
  * resurrect), CDF emission covers exactly the pre/post/insert images,
  * and the declared rejects (duplicate source keys, schema drift) are
  * loud. */
class DeltaMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_delta_merge").resolve("t").toString

  private def rows(r: Range) = r.map(i => (i.toLong, s"v$i", i * 1.0))
    .toDF("id", "s", "v")

  test("upsert: matched keys replaced, new keys inserted, rest carried") {
    val t = tbl()
    DeltaWrite.write(rows(1 to 10), t)
    val src = Seq((3L, "UPD", 300.0), (11L, "NEW", 110.0)).toDF("id", "s", "v")
    val v = DeltaWrite.merge(spark, t, src, Seq("id"))
    assert(v == 1L)
    val got = DeltaRead.read(spark, t).as[(Long, String, Double)]
      .collect().map { case (i, s, d) => i -> ((s, d)) }.toMap
    assert(got.size == 11)
    assert(got(3L) == (("UPD", 300.0)))
    assert(got(11L) == (("NEW", 110.0)))
    assert(got(5L) == (("v5", 5.0)))
  }

  test("untouched files survive the merge physically") {
    val t = tbl()
    // two key-disjoint commits -> two files with disjoint stats ranges
    DeltaWrite.write(rows(1 to 100).coalesce(1), t)
    DeltaWrite.write(rows(1001 to 1100).coalesce(1), t)
    val before = DeltaRead.snapshot(t).files.map(_.path).toSet
    assert(before.size == 2)
    DeltaWrite.merge(spark, t,
      Seq((1001L, "UPD", 0.0)).toDF("id", "s", "v"), Seq("id"))
    val after = DeltaRead.snapshot(t).files.map(_.path).toSet
    // the low-range file was never rewritten (stats prune + touch check)
    assert((before intersect after).size == 1)
    assert(DeltaRead.read(spark, t).count() == 200)
  }

  test("composes with deletion vectors: suppressed rows do not resurrect") {
    val t = tbl()
    DeltaWrite.write(rows(1 to 20).coalesce(1), t)
    DeltaWrite.deleteWhere(spark, t, col("id") <= 5)
    // merging key 3 (DV-suppressed): logically absent -> INSERT
    DeltaWrite.merge(spark, t,
      Seq((3L, "BACK", 33.0), (7L, "UPD", 77.0)).toDF("id", "s", "v"),
      Seq("id"))
    val got = DeltaRead.read(spark, t).as[(Long, String, Double)]
      .collect().map { case (i, s, d) => i -> ((s, d)) }.toMap
    assert(got.size == 16) // 20 - 5 deleted + key 3 reinserted (7 updated in place)
    assert(got(3L) == (("BACK", 33.0)))
    assert(got(7L) == (("UPD", 77.0)))
    assert(!got.contains(1L) && !got.contains(5L))
    // the rewrite purged the touched file's DV
    assert(DeltaRead.snapshot(t).files.forall(_.deletionVector.isEmpty))
  }

  test("CDF: feed carries exactly pre/post/insert, never carried rows") {
    val t = tbl()
    DeltaWrite.write(rows(1 to 10), t)
    DeltaWrite.setProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true"))
    val src = Seq((2L, "UPD", 200.0), (12L, "NEW", 120.0)).toDF("id", "s", "v")
    val v = DeltaWrite.merge(spark, t, src, Seq("id"))
    val feed = DeltaRead.readChangeFeed(spark, t, v - 1, v)
    val byType = feed.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 1L))
    val pre = feed.filter(col("_change_type") === "update_preimage")
      .select("id", "s", "v").as[(Long, String, Double)].head()
    assert(pre == ((2L, "v2", 2.0)))
    val post = feed.filter(col("_change_type") === "update_postimage")
      .select("id", "s", "v").as[(Long, String, Double)].head()
    assert(post == ((2L, "UPD", 200.0)))
  }

  test("rejects: duplicate source keys, schema drift, empty source no-op") {
    val t = tbl()
    DeltaWrite.write(rows(1 to 5), t)
    intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, t,
        Seq((1L, "a", 0.0), (1L, "b", 0.0)).toDF("id", "s", "v"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, t,
        Seq((1L, "a")).toDF("id", "s"), Seq("id"))
    }
    assert(DeltaWrite.merge(spark, t,
      rows(1 to 5).filter(col("id") > 100), Seq("id")) == 0L) // head unchanged
  }

  test("partitioned target: an update may move a row across partitions") {
    val t = tbl()
    val base = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "p", "v")
    DeltaWrite.write(base, t, Seq("p"))
    DeltaWrite.merge(spark, t,
      Seq((2L, "b", 22.0)).toDF("id", "p", "v"), Seq("id"))
    val got = DeltaRead.read(spark, t).as[(Long, String, Double)]
      .collect().toSet
    assert(got == Set((1L, "a", 1.0), (2L, "b", 22.0), (3L, "b", 3.0)))
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.exists(_.partitionValues("p") == "b"))
  }
}
