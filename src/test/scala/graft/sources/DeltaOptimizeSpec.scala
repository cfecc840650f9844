package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of DeltaWrite.optimize: logical state is INVARIANT (values
  * identical before/after), the commit carries only dataChange=false
  * actions, bin-pack coalesces per partition tuple, deletion vectors are
  * purged by the rewrite, z-order layouts are run-invariant, and the
  * declared rejects are loud. */
class DeltaOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_delta_opt").resolve("t").toString

  private def ids(n: Int) = (1 to n).map(i => (i.toLong, s"p${i % 3}", i * 10.0))
    .toDF("id", "p", "v")

  test("bin-pack: values invariant, one file per tuple, dataChange=false") {
    val t = tbl()
    (0 until 3).foreach(i => DeltaWrite.write(
      ids(90).filter(col("id") % 3 === i), t, Seq("p")))
    val preRows = DeltaRead.read(spark, t).as[(Long, String, Double)]
      .collect().toSet
    val before = DeltaRead.snapshot(t).files.size
    val (b, a) = DeltaWrite.optimize(spark, t)
    assert(b == before && a == 3 && a < b) // 3 partition tuples
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.size == 3)
    assert(snap.files.map(_.partitionValues).distinct.size == 3)
    assert(DeltaRead.read(spark, t).as[(Long, String, Double)]
      .collect().toSet == preRows)
    // every action in the OPTIMIZE commit has dataChange=false
    val commit = Files.readString(
      Paths.get(t, "_delta_log", f"${snap.version}%020d.json"))
    commit.linesIterator.filter(l => l.contains("\"add\"") ||
      l.contains("\"remove\"")).foreach(l =>
      assert(l.contains("\"dataChange\":false"), l))
  }

  test("bin-pack purges deletion vectors and is a no-op when nothing gains") {
    val t = tbl()
    DeltaWrite.write(ids(60).coalesce(1), t)
    DeltaWrite.optimize(spark, t) match { case (b2, a2) =>
      // single file, no DV: untouched — head version unchanged
      assert(b2 == a2 && DeltaRead.snapshot(t).version == 0L)
    }
    DeltaWrite.deleteWhere(spark, t, col("id") % 2 === 0)
    assert(DeltaRead.snapshot(t).files.exists(_.deletionVector.nonEmpty))
    val (_, after) = DeltaWrite.optimize(spark, t) // lone DV'd file rewrites
    assert(after == 1)
    val snap = DeltaRead.snapshot(t)
    assert(snap.files.forall(_.deletionVector.isEmpty))
    assert(DeltaRead.read(spark, t).as[(Long, String, Double)].collect()
      .forall(_._1 % 2 == 1))
    // the purged rows stay gone and counts are exact
    assert(DeltaRead.read(spark, t).count() == 30)
  }

  test("z-order layout is run-invariant: two identical tables, same stats") {
    def build(): String = {
      val t = tbl()
      val df = (1 to 4000).map(i =>
        ((i * 2654435761L) % 1000, (i * 40503L) % 1000, i.toLong))
        .toDF("x", "y", "id")
      (0 until 4).foreach(i => DeltaWrite.write(
        df.filter(col("id") % 4 === i), t))
      val bytes = DeltaRead.snapshot(t).files.map(_.size).sum
      DeltaWrite.optimize(spark, t, targetFileBytes = math.max(1, bytes / 8),
        zorderBy = Seq("x", "y"))
      t
    }
    def statsOf(t: String): Set[(String, String, String, String)] =
      DeltaRead.snapshot(t).files.flatMap(_.stats.map(st =>
        (st.min("x").asText, st.max("x").asText,
          st.min("y").asText, st.max("y").asText))).toSet
    val s1 = statsOf(build())
    val s2 = statsOf(build())
    assert(s1.nonEmpty && s1 == s2)
  }

  test("rejects: z-order on a partitioned table; unknown z column") {
    val t = tbl()
    DeltaWrite.write(ids(30), t, Seq("p"))
    intercept[IllegalArgumentException] {
      DeltaWrite.optimize(spark, t, zorderBy = Seq("id"))
    }
    val t2 = tbl()
    DeltaWrite.write(ids(30), t2)
    intercept[IllegalArgumentException] {
      DeltaWrite.optimize(spark, t2, zorderBy = Seq("nope"))
    }
  }

  test("optimize then vacuum reclaims the rewritten originals") {
    val t = tbl()
    (0 until 3).foreach(i => DeltaWrite.write(
      ids(90).filter(col("id") % 3 === i), t))
    val preFiles = Files.walk(Paths.get(t)).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.toString.contains("_delta_log"))
    DeltaWrite.optimize(spark, t)
    assert(DeltaWrite.vacuum(spark, t) == preFiles) // all originals gone
    assert(DeltaRead.read(spark, t).count() == 90)  // table intact
  }
}
