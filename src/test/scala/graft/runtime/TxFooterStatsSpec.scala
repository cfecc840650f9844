package graft.runtime

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** batchStats now reads per-file min/max from parquet FOOTERS (driver-side
  * metadata) instead of a full read-back Spark job per commit. These specs
  * pin the footer path to the scan path's exact contract: same rendered
  * values (Spark CAST AS STRING), same no-entry cases (all-NULL, absent
  * column), and a working scan fallback for INT96 timestamps. */
class TxFooterStatsSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_footer_stats").toString

  /** the pre-footer reference computation: per-file min/max via a scan */
  private def scanReference(t: TxLogTable, name: String,
                            cols: Seq[String]): Map[(String, String), (String, String)] = {
    val v = t.currentVersion(name).get
    val fs = t.files(name, v)
    val base = java.nio.file.Paths.get(t.baseDir, name)
    val df = spark.read.option("mergeSchema", "true")
      .parquet(fs.map(f => base.resolve(f).toString): _*)
    val present = df.columns.toSet
    val use = cols.filter(present)
    val aggs = use.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    df.groupBy(input_file_name().as("__f")).agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.flatMap { r =>
        val abs = r.getAs[String]("__f")
        fs.find(f => abs.endsWith("/" + f)).toSeq.flatMap { rel =>
          use.flatMap { c =>
            (Option(r.getAs[String](s"__mn_$c")), Option(r.getAs[String](s"__mx_$c"))) match {
              case (Some(mn), Some(mx)) => Some((rel, c) -> (mn, mx))
              case _                    => None
            }
          }
        }
      }.toMap
  }

  private def withTimestampType[A](v: String)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, prev)
  }

  test("footer stats equal the scan stats across types") {
    import spark.implicits._
    val t = new TxLogTable(spark, tmp())
    val df: DataFrame = Seq(
      (5L, "alpha", 1.5, java.sql.Date.valueOf("2024-02-01"), BigDecimal("12.30"), true),
      (9L, "omega", -2.25, java.sql.Date.valueOf("2023-12-31"), BigDecimal("7.05"), false))
      .toDF("id", "s", "d", "dt", "dec", "b")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
    t.append("tbl", df.repartition(2))
    t.setStatsColumns("tbl", Seq("id", "s", "d", "dt", "dec", "b"))
    val v = t.currentVersion("tbl").get
    val got = t.fileStats("tbl", v)
    val want = scanReference(t, "tbl", Seq("id", "s", "d", "dt", "dec", "b"))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("INT64-micros timestamp stats come from the footer and render like CAST AS STRING") {
    import spark.implicits._
    withTimestampType("TIMESTAMP_MICROS") {
      val t = new TxLogTable(spark, tmp())
      val df = Seq(
        java.sql.Timestamp.valueOf("2024-02-01 12:00:00"),
        java.sql.Timestamp.valueOf("2024-02-21 12:00:00.000123"),
        java.sql.Timestamp.valueOf("0001-01-01 00:00:01"),
        java.sql.Timestamp.valueOf("8888-12-31 23:59:59"))
        .toDF("sdts")
      t.append("tbl", df.coalesce(1))
      t.setStatsColumns("tbl", Seq("sdts"))
      val v = t.currentVersion("tbl").get
      val got = t.fileStats("tbl", v)
      assert(got.values.toSeq === Seq(("0001-01-01 00:00:01", "8888-12-31 23:59:59")))
      assert(got === scanReference(t, "tbl", Seq("sdts")))
      // fractional seconds render trimmed, exactly like Spark's cast
      val t2 = new TxLogTable(spark, tmp())
      t2.append("tbl", Seq(
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00.5"),
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00.000001")).toDF("sdts").coalesce(1))
      t2.setStatsColumns("tbl", Seq("sdts"))
      val got2 = t2.fileStats("tbl", t2.currentVersion("tbl").get)
      assert(got2.values.toSeq ===
        Seq(("2024-02-01 00:00:00.000001", "2024-02-01 00:00:00.5")))
    }
  }

  test("INT96 timestamps fall back to the scan and stay correct") {
    import spark.implicits._
    withTimestampType("INT96") {
      val t = new TxLogTable(spark, tmp())
      t.append("tbl", Seq(
        java.sql.Timestamp.valueOf("2024-02-01 12:00:00"),
        java.sql.Timestamp.valueOf("2024-03-01 06:30:15")).toDF("sdts").coalesce(1))
      t.setStatsColumns("tbl", Seq("sdts"))
      val got = t.fileStats("tbl", t.currentVersion("tbl").get)
      assert(got.values.toSeq ===
        Seq(("2024-02-01 12:00:00", "2024-03-01 06:30:15")))
      assert(got === scanReference(t, "tbl", Seq("sdts")))
    }
  }

  test("all-NULL columns get no stats entry; files with them stay candidates") {
    import spark.implicits._
    val t = new TxLogTable(spark, tmp())
    t.append("tbl", Seq((1L, Option.empty[String]), (2L, None))
      .toDF("id", "s").coalesce(1))
    t.setStatsColumns("tbl", Seq("id", "s"))
    val v = t.currentVersion("tbl").get
    val got = t.fileStats("tbl", v)
    assert(got.keys.map(_._2).toSet === Set("id"), "all-NULL column must carry no entry")
    assert(t.candidateFiles("tbl", "s", "zzz", "zzz") === t.files("tbl", v),
      "missing stats must never prune")
  }

  test("multi-rowgroup binary decimal stats combine in SIGNED order") {
    // decimal(38,2) stores as FIXED_LEN_BYTE_ARRAY — a signed big-endian
    // integer. Combining per-rowgroup min/max in unsigned byte order (the
    // string rule) ranks negatives ABOVE positives, so a file whose blocks
    // mix signs would store min > true min and wrong-prune. Tiny
    // parquet.block.size forces one file into many row groups.
    val t = new TxLogTable(spark, tmp())
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", "1024")
    try {
      val df = spark.range(0, 4000).select(
        (col("id") - 2000).cast("decimal(38,2)").as("dec"))
      t.append("tbl", df.coalesce(1))
    } finally {
      prev match {
        case Some(p) => hc.set("parquet.block.size", p)
        case None    => hc.unset("parquet.block.size")
      }
    }
    t.setStatsColumns("tbl", Seq("dec"))
    val v = t.currentVersion("tbl").get
    val got = t.fileStats("tbl", v)
    assert(got === scanReference(t, "tbl", Seq("dec")))
    assert(got.values.toSeq === Seq(("-2000.00", "1999.00")))
    // single-file sanity: really exercised the multi-block combine
    assert(t.files("tbl", v).size === 1)
  }

  test("timestamps outside years 1-9999 fall back to the scan rendering") {
    import spark.implicits._
    withTimestampType("TIMESTAMP_MICROS") {
      val t = new TxLogTable(spark, tmp())
      t.append("tbl", Seq(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        // java.sql.Timestamp.valueOf rejects 5-digit years; go via Instant
        java.sql.Timestamp.from(java.time.Instant.parse("+10000-01-01T00:00:00Z")))
        .toDF("sdts").coalesce(1))
      t.setStatsColumns("tbl", Seq("sdts"))
      val got = t.fileStats("tbl", t.currentVersion("tbl").get)
      // Spark renders year 10000 as "+10000-…"; %04d would emit "10000-…".
      // The footer path must refuse (scan fallback) so the stored stat is
      // byte-identical to the CAST AS STRING contract.
      assert(got === scanReference(t, "tbl", Seq("sdts")))
      assert(got.values.toSeq.map(_._2).forall(_.startsWith("+10000-")))
    }
  }

  test("files predating an added column get no entry for it and never prune") {
    import spark.implicits._
    val t = new TxLogTable(spark, tmp())
    t.append("tbl", Seq(1L, 2L).toDF("id").coalesce(1))
    t.addColumn("tbl", "extra", "bigint")
    t.append("tbl", Seq((3L, 30L), (4L, 40L)).toDF("id", "extra").coalesce(1))
    t.setStatsColumns("tbl", Seq("id", "extra"))
    val v = t.currentVersion("tbl").get
    val live = t.files("tbl", v)
    val got = t.fileStats("tbl", v)
    // both files carry id stats; only the post-DDL file carries extra stats
    assert(got.keys.count(_._2 == "id") === 2)
    assert(got.keys.count(_._2.startsWith("extra")) === 1)
    // pruning on extra keeps the pre-DDL file as a candidate (safe)
    assert(t.candidateFiles("tbl", "extra", "100", "200").size === live.size - 1 ||
      t.candidateFiles("tbl", "extra", "100", "200").size === live.size)
    assert(t.candidateFiles("tbl", "extra", "30", "40").size === live.size)
  }
}
