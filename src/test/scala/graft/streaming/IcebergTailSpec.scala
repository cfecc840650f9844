package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{IcebergRead, IcebergWrite}

/** Contract of IcebergTail: one sink call per NEW snapshot with exactly
  * its appended rows, metadata versions without a new snapshot are
  * no-ops, resume picks up only unseen versions, and non-append
  * snapshots in the tail reject loudly. */
class IcebergTailSpec extends SparkSpec {
  import spark.implicits._

  private def dirs(): (String, String) = {
    val d = Files.createTempDirectory("graft_ice_tail")
    (d.resolve("t").toString, d.resolve("cp").toString)
  }

  private def rows(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  private def drain(t: String, cp: String,
                    got: scala.collection.mutable.Map[Long, Long]): Unit = {
    val q = IcebergTail.stream(spark, t, cp,
      (df: DataFrame, sid: Long) => { got(sid) = df.count() })
    q.processAllAvailable(); q.stop()
  }

  test("one batch per snapshot; resume sees only new ones; expiry is a no-op") {
    val (t, cp) = dirs()
    IcebergWrite.write(rows(1 to 10), t)  // s1
    IcebergWrite.write(rows(11 to 13), t) // s2
    val got = scala.collection.mutable.Map[Long, Long]()
    drain(t, cp, got)
    assert(got == Map(1L -> 10L, 2L -> 3L))
    got.clear()
    IcebergWrite.write(rows(14 to 15), t) // s3
    drain(t, cp, got)
    assert(got == Map(3L -> 2L)) // resume: only the new snapshot
    got.clear()
    IcebergWrite.expireSnapshots(t, keepLast = 1) // metadata-only version
    drain(t, cp, got)
    assert(got.isEmpty) // no new snapshot -> no batch
  }

  test("batch rows match the snapshot's appended slice exactly") {
    val (t, cp) = dirs()
    IcebergWrite.write(rows(1 to 5), t)
    IcebergWrite.write(rows(6 to 8), t)
    val seen = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = IcebergTail.stream(spark, t, cp, (df: DataFrame, sid: Long) =>
      { seen(sid) = df.select("id").as[Long].collect().toSet })
    q.processAllAvailable(); q.stop()
    assert(seen(1L) == (1L to 5L).toSet)
    assert(seen(2L) == (6L to 8L).toSet)
  }

  test("overwrite in the tail rejects loudly instead of dropping rows") {
    val (t, cp) = dirs()
    IcebergWrite.write(rows(1 to 5), t)
    val got = scala.collection.mutable.Map[Long, Long]()
    drain(t, cp, got)
    IcebergWrite.write(rows(6 to 9), t, mode = "overwrite")
    val ex = intercept[Exception] { drain(t, cp, got) }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("append-only")))
  }

  test("MoR delete in the tail rejects loudly") {
    val (t, cp) = dirs()
    IcebergWrite.write(rows(1 to 5), t)
    val got = scala.collection.mutable.Map[Long, Long]()
    drain(t, cp, got)
    IcebergWrite.deleteWhere(spark, t, col("id") % 2 === 0)
    val ex = intercept[Exception] { drain(t, cp, got) }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("append-only")))
  }
}
