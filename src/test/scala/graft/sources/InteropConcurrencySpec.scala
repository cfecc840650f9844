package graft.sources

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-concurrency contract of the open-format interop writers: version
  * claims go through a hard-link CAS (the TxLogTable.tryCommit mechanism),
  * so of two writers racing for the same version exactly the winners'
  * commits land, every loser fails LOUDLY with
  * ConcurrentModificationException, and the log/reader state is never
  * torn — no silently replaced commit JSON, no overwritten manifests. */
class InteropConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tbl(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  test("Delta: a version claimed between head-read and commit loses loudly, log intact") {
    val t = tbl("graft_delta_race")
    DeltaWrite.write(spark.range(0, 10).select($"id"), t)
    // another engine claims version 1 AFTER our head read (deterministic
    // stand-in for the race window): pre-create the commit file, then
    // drive the CAS publish step directly — it must refuse, not replace
    val logDir = Paths.get(t, "_delta_log")
    val foreign = """{"commitInfo":{"operation":"WRITE","engineInfo":"other-engine"}}"""
    Files.writeString(logDir.resolve(f"${1L}%020d.json"), foreign)
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaWrite.commitCas(logDir, 1L,
        Seq("""{"commitInfo":{"operation":"WRITE","engineInfo":"graft-delta-write"}}"""))
    }
    assert(e.getMessage.contains("concurrently"))
    // the foreign commit was NOT replaced and the table still reads
    assert(Files.readString(logDir.resolve(f"${1L}%020d.json")) == foreign)
    assert(DeltaRead.read(spark, t).count() == 10L)
  }

  test("Iceberg: a pre-claimed metadata version makes the late writer fail loudly") {
    val t = tbl("graft_ice_race")
    IcebergWrite.write(spark.range(0, 10).select($"id"), t)
    val metaDir = Paths.get(t, "metadata")
    val foreign = Files.readString(metaDir.resolve("v1.metadata.json"))
    Files.writeString(metaDir.resolve("v2.metadata.json"), foreign)
    val e = intercept[java.util.ConcurrentModificationException] {
      IcebergWrite.write(spark.range(10, 20).select($"id"), t)
    }
    assert(e.getMessage.contains("concurrently"))
    assert(Files.readString(metaDir.resolve("v2.metadata.json")) == foreign,
      "the winner's metadata must not be replaced")
    // hint still names a readable version; the reader resolves cleanly
    assert(IcebergRead.read(spark, t).count() == 10L)
  }

  test("Delta: N racing writers — winners commit, losers fail, history contiguous") {
    val t = tbl("graft_delta_race_n")
    DeltaWrite.write(spark.range(0, 5).select($"id"), t) // v0, 5 rows
    val n = 6
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val results = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
        def call(): Either[Throwable, Long] = {
          latch.await()
          try Right(DeltaWrite.write(
            spark.range(100L * (i + 1), 100L * (i + 1) + 10).select($"id"), t))
          catch { case e: Throwable => Left(e) }
        }
      })
    }
    latch.countDown()
    val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    val wins = outcomes.collect { case Right(v) => v }
    val losses = outcomes.collect { case Left(e) => e }
    assert(wins.size + losses.size == n)
    assert(losses.forall(_.isInstanceOf[java.util.ConcurrentModificationException]),
      s"losers must fail with CME, got ${losses.map(_.getClass.getName)}")
    // committed versions are distinct and the log is contiguous 0..max
    assert(wins.toSet.size == wins.size)
    val logDir = Paths.get(t, "_delta_log")
    val committed = Files.list(logDir).iterator()
    val versions = scala.jdk.CollectionConverters.IteratorHasAsScala(committed)
      .asScala.map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
    assert(versions == (0L to versions.max))
    // every winner's rows (and only those) are present
    assert(DeltaRead.read(spark, t).count() == 5L + 10L * wins.size)
  }
}
