package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of IcebergWrite.rewriteDataFiles and IcebergWrite.merge —
  * the Iceberg half of the maintenance/upsert matrix (the Delta half is
  * DeltaOptimizeSpec/DeltaMergeSpec): values invariant under compaction,
  * MoR deletes materialized and dropped, replace snapshots visible as
  * such, merge upsert semantics with untouched-file economy. */
class IcebergMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_ice_maint").resolve("t").toString

  private def rows(r: Range) = r.map(i => (i.toLong, s"p${i % 3}", i * 1.0))
    .toDF("id", "p", "v")

  test("bin-pack: values invariant, fewer files, one per touched tuple") {
    val t = tbl()
    (0 until 3).foreach(i => IcebergWrite.write(
      rows(1 to 90).filter(col("id") % 3 === i), t, Seq("p")))
    val pre = IcebergRead.read(spark, t).as[(Long, String, Double)]
      .collect().toSet
    val before = IcebergRead.snapshot(t).files.size
    val (b, a) = IcebergWrite.rewriteDataFiles(spark, t)
    assert(b == before && a == 3 && a < b) // 3 partition tuples
    assert(IcebergRead.read(spark, t).as[(Long, String, Double)]
      .collect().toSet == pre)
    // a no-op rewrite leaves the head snapshot unchanged
    val head = IcebergRead.snapshot(t).snapshotId
    assert(IcebergWrite.rewriteDataFiles(spark, t) == ((3, 3)))
    assert(IcebergRead.snapshot(t).snapshotId == head)
  }

  test("MoR debt: compaction materializes deletes and drops delete files") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 60), t)
    IcebergWrite.deleteWhere(spark, t, col("id") % 2 === 0)
    assert(IcebergRead.snapshot(t).deletes.nonEmpty)
    IcebergWrite.rewriteDataFiles(spark, t)
    val snap = IcebergRead.snapshot(t)
    assert(snap.deletes.isEmpty) // debt folded in
    val got = IcebergRead.read(spark, t).as[(Long, String, Double)].collect()
    assert(got.length == 30 && got.forall(_._1 % 2 == 1))
  }

  test("z-order rewrite is deterministic and prunes via manifest bounds") {
    def build(): String = {
      val t = tbl()
      val df = (1 to 4000).map(i =>
        ((i * 2654435761L) % 1000, (i * 40503L) % 1000, i.toLong))
        .toDF("x", "y", "id")
      (0 until 4).foreach(i => IcebergWrite.write(
        df.filter(col("id") % 4 === i), t))
      val bytes = IcebergRead.snapshot(t).files.map(_.size).sum
      IcebergWrite.rewriteDataFiles(spark, t,
        targetFileBytes = math.max(1, bytes / 8), zorderBy = Seq("x", "y"))
      t
    }
    def statsOf(t: String): Set[(String, String)] =
      IcebergRead.snapshot(t).files.flatMap(_.stats.map(st =>
        (st.min("x").asText, st.max("y").asText))).toSet
    val s1 = statsOf(build())
    assert(s1.nonEmpty && s1 == statsOf(build()))
  }

  test("merge: upsert semantics, untouched files survive, deletes hold") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 100).coalesce(1), t)
    IcebergWrite.write(rows(1001 to 1100).coalesce(1), t)
    IcebergWrite.deleteWhere(spark, t, col("id") === 1002L)
    val before = IcebergRead.snapshot(t).files.map(_.path).toSet
    assert(before.size == 2)
    val src = Seq((1001L, "pU", 0.5), (2000L, "pN", 2.0)).toDF("id", "p", "v")
    IcebergWrite.merge(spark, t, src, Seq("id"))
    val snap = IcebergRead.snapshot(t)
    // low-range file pruned by bounds -> never rewritten
    assert((before intersect snap.files.map(_.path).toSet).size == 1)
    val got = IcebergRead.read(spark, t).as[(Long, String, Double)]
      .collect().map { case (i, p, v) => i -> ((p, v)) }.toMap
    assert(got.size == 200) // 200 - 1 deleted + 1 inserted
    assert(got(1001L) == (("pU", 0.5)))   // updated
    assert(got(2000L) == (("pN", 2.0)))   // inserted
    assert(!got.contains(1002L))          // DV'd row did not resurrect
  }

  test("merge rejects duplicate source keys and schema drift; empty no-op") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 5), t)
    intercept[IllegalArgumentException] {
      IcebergWrite.merge(spark, t,
        Seq((1L, "a", 0.0), (1L, "b", 0.0)).toDF("id", "p", "v"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      IcebergWrite.merge(spark, t, Seq((1L, "a")).toDF("id", "p"), Seq("id"))
    }
    val head = IcebergRead.snapshot(t).snapshotId
    assert(IcebergWrite.merge(spark, t,
      rows(1 to 5).filter(col("id") > 100), Seq("id")) == head)
  }

  test("replace snapshot rejects in the append-only tail; time travel holds") {
    val t = tbl()
    IcebergWrite.write(rows(1 to 30).coalesce(2), t)
    IcebergWrite.write(rows(31 to 60).coalesce(2), t)
    IcebergWrite.rewriteDataFiles(spark, t) // s3: replace
    // time travel to the pre-compaction snapshot still serves it
    assert(IcebergRead.readAt(spark, t, 2L).count() == 60)
    val cp = Files.createTempDirectory("graft_ice_maint_cp").toString
    val got = scala.collection.mutable.Map[Long, Long]()
    val ex = intercept[Exception] {
      val q = graft.streaming.IcebergTail.stream(spark, t, cp,
        (df, sid) => { got(sid) = df.count() })
      q.processAllAvailable(); q.stop()
    }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("append-only")))
  }
}
