package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.DeltaWrite

/** DeltaTail's declared scope: append-only tails. Non-append commits
  * (overwrites, DV deletes) must fail the stream loudly — silently
  * streaming rows a concurrent writer suppressed is the failure mode the
  * scope exists to prevent. */
class DeltaTailSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_tail_spec").resolve("t").toString

  private def drain(t: String, cp: String,
                    sink: (DataFrame, Long) => Unit = (_, _) => ()): Unit = {
    val q = DeltaTail.stream(spark, t, cp, sink)
    try { q.processAllAvailable(); q.stop() }
    finally if (q.isActive) q.stop()
  }

  test("append commits stream in version order with partition values restored") {
    val t = tbl()
    DeltaWrite.write(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), t, Seq("p"))
    DeltaWrite.write(Seq((3L, "a")).toDF("id", "p"), t)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Set[(Long, String)])]()
    drain(t, s"$t/../cp1", (df, v) =>
      seen.synchronized { seen += ((v, df.as[(Long, String)].collect().toSet)): Unit })
    assert(seen.map(_._1).toSeq == Seq(0L, 1L))
    assert(seen.head._2 == Set((1L, "a"), (2L, "b")))
    assert(seen(1)._2 == Set((3L, "a")))
  }

  test("a remove action (overwrite) in the tail fails the stream loudly") {
    val t = tbl()
    DeltaWrite.write(Seq((1L, "a")).toDF("id", "p"), t, Seq("p"))
    DeltaWrite.write(Seq((9L, "z")).toDF("id", "p"), t, mode = "overwrite")
    val e = intercept[Exception] { drain(t, s"$t/../cp2") }
    assert(Option(e.getMessage).exists(_.contains("append-only")) ||
      Option(e.getCause).exists(c =>
        Option(c.getMessage).exists(_.contains("append-only"))),
      s"want append-only rejection, got $e")
  }

  test("a deletion vector in the tail fails the stream loudly") {
    val t = tbl()
    DeltaWrite.write(spark.range(0, 10).select($"id"), t)
    DeltaWrite.deleteWhere(spark, t, col("id") < 3)
    val e = intercept[Exception] { drain(t, s"$t/../cp3") }
    assert(e.toString.contains("append-only") ||
      Option(e.getCause).exists(_.toString.contains("append-only")),
      s"want append-only rejection, got $e")
  }
}
