package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import IcebergTransforms._

/** Contract of the Iceberg partition-transform family: the bucket hash
  * matches the spec's published Appendix B vectors (any deviation would
  * route rows to buckets a conformant engine never probes), transform
  * evaluation follows the spec's arithmetic, write layout + manifest
  * tuples + read pruning all agree, and pruning is EXACT at transform
  * granularity on an end-to-end days+bucket table. */
class IcebergTransformsSpec extends SparkSpec {
  import spark.implicits._

  // ---- spec Appendix B hash vectors ----------------------------------

  test("bucket hash matches the spec's Appendix B vectors") {
    assert(hashLong(34L) == 2017239379)                 // int and long 34
    assert(hashBytes("iceberg".getBytes("UTF-8")) == 1210000089)
    assert(hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
    // date 2017-11-16 hashes as its epoch-day int widened to long
    val days = java.time.LocalDate.of(2017, 11, 16).toEpochDay
    assert(hashLong(days) == -653330422)
    // time 22:31:08 as micros from midnight
    assert(hashLong((22L * 3600 + 31 * 60 + 8) * 1000000L) == -662762989)
    // timestamp 2017-11-16T22:31:08 as epoch micros
    val micros = (days * 86400L + 22 * 3600 + 31 * 60 + 8) * 1000000L
    assert(hashLong(micros) == -2047944441)
  }

  // ---- transform arithmetic ------------------------------------------

  test("transform evaluation follows the spec's arithmetic") {
    // truncate floors toward -inf for integers (W-multiple buckets)
    assert(Truncate(10).eval(17L, PlainLong).contains(10L))
    assert(Truncate(10).eval(-3L, PlainLong).contains(-10L))
    assert(Truncate(10).eval(-10L, PlainLong).contains(-10L))
    // string truncate takes the first W code points
    assert(Truncate(3).eval("iceberg", Str).contains("ice"))
    assert(Truncate(9).eval("ice", Str).contains("ice"))
    // temporal transforms: epoch-anchored ordinals
    val d = java.time.LocalDate.of(2017, 11, 16).toEpochDay // 17486
    assert(Day.eval(d, EpochDays).contains(d))
    assert(Year.eval(d, EpochDays).contains(47L))           // 2017 - 1970
    assert(Month.eval(d, EpochDays).contains(47L * 12 + 10L))
    val micros = d * 86400L * 1000000L + 5L * 3600 * 1000000L
    assert(Day.eval(micros, EpochMicros).contains(d))
    assert(Hour.eval(micros, EpochMicros).contains(d * 24 + 5))
    // pre-1970 timestamps floor toward -inf, not toward zero
    assert(Day.eval(-1L, EpochMicros).contains(-1L))
    assert(Hour.eval(-1L, EpochMicros).contains(-1L))
    // bucket of a hash-equal int/long pair agrees
    assert(Bucket(16).eval(34L, PlainLong) ==
      Bucket(16).eval(34L, EpochMicros))
    // hour over a date source is undefined — keep, never guess
    assert(Hour.eval(d, EpochDays).isEmpty)
  }

  test("parse: metadata spec strings and write-API call syntax") {
    assert(parseSpec("bucket[8]") == Bucket(8))
    assert(parseSpec("truncate[4]") == Truncate(4))
    assert(parseSpec("day") == Day)
    assert(parseSpec("days") == Day)
    assert(parseSpec("identity") == Identity)
    assert(parseSpec("zorder_v9") == Opaque("zorder_v9")) // future-proof
    assert(parseField("c_mktsegment") ==
      PartField("c_mktsegment", "c_mktsegment", Identity))
    assert(parseField("bucket(8, id)") == PartField("id_bucket", "id", Bucket(8)))
    assert(parseField("days(ts)") == PartField("ts_day", "ts", Day))
    assert(parseField("truncate(4, s)") == PartField("s_trunc", "s", Truncate(4)))
    intercept[IllegalArgumentException] { parseField("mystery(ts)") }
  }

  // ---- end-to-end: write layout + read pruning -----------------------

  private def tbl(pfx: String): String =
    Files.createTempDirectory(pfx).resolve("t").toString

  test("days+bucket table: roundtrip, exact pruning, maintenance-safe") {
    val t = tbl("graft_ice_transform")
    val df = (0L until 400L).map { i =>
      (i, java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T00:00:00Z")
        .plusSeconds(i * 3600)), s"v$i")
    }.toDF("id", "ts", "s")
    val s1 = IcebergWrite.write(df, t, Seq("days(ts)", "bucket(4, id)"))
    assert(s1 == 1L)

    val snap = IcebergRead.snapshot(t)
    assert(snap.partitionFields.map(_.transform) == Seq(Day, Bucket(4)))
    assert(snap.identityPartitionCols.isEmpty)
    // 400 hourly rows span 17 days; layout = (day, bucket) tuples
    val day0 = java.time.LocalDate.parse("2024-03-01").toEpochDay
    val tuples = snap.files.map(f =>
      (f.partitionValues("ts_day").toLong, f.partitionValues("id_bucket").toLong))
    assert(tuples.distinct.size == 17 * 4, "17 days x 4 buckets")
    assert(tuples.map(_._1).min == day0 && tuples.map(_._1).max == day0 + 16)
    assert(tuples.forall { case (_, b) => b >= 0 && b < 4 })
    // manifest tuple values agree with direct transform arithmetic
    // over the file contents (the property pruning soundness rests on)
    snap.files.foreach { f =>
      val rows = spark.read.parquet(f.path)
        .select(col("id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)].collect()
      assert(rows.forall { case (id, us) =>
        Math.floorDiv(us, 86400000000L) == f.partitionValues("ts_day").toLong &&
          (hashLong(id) & Int.MaxValue) % 4 == f.partitionValues("id_bucket").toLong
      })
    }

    // full read returns everything (data files kept the source columns)
    assert(IcebergRead.read(spark, t).as[(Long, java.sql.Timestamp, String)]
      .collect().toSet == df.as[(Long, java.sql.Timestamp, String)].collect().toSet)

    // ts-range pruning is EXACT at day granularity (ts carries no
    // footer stats, so the transform channel is the only pruner)
    val lo = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-05T00:00:00Z"))
    val hi = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-07T00:00:00Z"))
    val ranged = IcebergRead.read(spark, t)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
    // SCHEDULED files (from the scan node, post-pruning): the pruner
    // must keep exactly days 4..6 — day 6 stays because `ts < day-6
    // midnight` still maps to tuple <= day(hi) at day granularity
    val scheduled = ranged.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles.toInt
    }.sum
    val keepDays = Set(day0 + 4, day0 + 5, day0 + 6)
    assert(scheduled ==
      snap.files.count(f => keepDays(f.partitionValues("ts_day").toLong)))
    assert(scheduled < snap.files.size)
    assert(ranged.count() == df.filter(col("ts") >= lit(lo) && col("ts") < lit(hi)).count())

    // id-equality pruning: only id 123's bucket survives the transform
    // channel (footer id-bounds may trim further; both are predicted)
    val b123 = (hashLong(123L) & Int.MaxValue) % 4
    val eq = IcebergRead.read(spark, t).filter(col("id") === 123L)
    val eqExpected = snap.files.count { f =>
      f.partitionValues("id_bucket").toLong == b123 &&
        f.stats.forall(st => st.min.get("id").forall(_.asLong <= 123L) &&
          st.max.get("id").forall(_.asLong >= 123L))
    }
    val eqScheduled = eq.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles.toInt
    }.sum
    assert(eqScheduled == eqExpected && eqScheduled < snap.files.size)
    assert(eq.as[(Long, java.sql.Timestamp, String)].collect()
      .map(_._3).toSeq == Seq("v123"))

    // maintenance paths preserve the transformed layout: merge rewrites
    // only touched files and re-routes through the same transforms
    val src = Seq((123L, java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-09T12:00:00Z")), "patched"),
      (1000L, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-02T00:00:00Z")), "new"))
      .toDF("id", "ts", "s")
    IcebergWrite.merge(spark, t, src, Seq("id"))
    val snap2 = IcebergRead.snapshot(t)
    snap2.files.foreach { f =>
      val rows = spark.read.parquet(f.path)
        .select(col("id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)].collect()
      assert(rows.forall { case (id, us) =>
        Math.floorDiv(us, 86400000000L) == f.partitionValues("ts_day").toLong &&
          (hashLong(id) & Int.MaxValue) % 4 == f.partitionValues("id_bucket").toLong
      })
    }
    val after = IcebergRead.read(spark, t)
    assert(after.count() == 401)
    assert(after.filter(col("id") === 123L).select(col("s"))
      .as[String].collect().toSeq == Seq("patched"))
  }

  test("truncate-partitioned strings: layout and range pruning") {
    val t = tbl("graft_ice_trunc")
    val df = Seq("alpha", "alto", "beta", "bolt", "gamma", "golf")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    IcebergWrite.write(df, t, Seq("truncate(2, s)"))
    val snap = IcebergRead.snapshot(t)
    assert(snap.files.map(_.partitionValues("s_trunc")).toSet ==
      Set("al", "be", "bo", "ga", "go"))
    // equality prunes to the literal's truncation bucket
    val one = IcebergRead.read(spark, t).filter(col("s") === "alto")
    assert(one.select(input_file_name()).distinct().count() == 1)
    assert(one.select(col("id")).as[Long].collect().toSeq == Seq(1L))
    // range pruning through the order-preserving truncation
    val ranged = IcebergRead.read(spark, t).filter(col("s") >= "b" && col("s") < "c")
    assert(ranged.select(input_file_name()).distinct().count() == 2) // be, bo
    assert(ranged.select(col("s")).as[String].collect().toSet == Set("beta", "bolt"))
  }

  test("null partition values round-trip as null tuples") {
    val t = tbl("graft_ice_nullpart")
    val df = Seq((1L, "a"), (2L, null), (3L, "a"), (4L, null))
      .toDF("id", "par")
    IcebergWrite.write(df, t, Seq("par"))
    val snap = IcebergRead.snapshot(t)
    // the null-source rows landed in a null-tuple file (spec: partition
    // fields are optional — null is a value, not an error)
    assert(snap.files.exists(_.partitionValues.get("par").contains(null)))
    assert(IcebergRead.read(spark, t).as[(Long, Option[String])]
      .collect().toSet ==
      Set((1L, Some("a")), (2L, None), (3L, Some("a")), (4L, None)))
    // equality predicates prune the null-tuple file (null never matches);
    // IsNull reads serve exactly the null rows
    assert(IcebergRead.read(spark, t).filter(col("par") === "a")
      .select(col("id")).as[Long].collect().toSet == Set(1L, 3L))
    assert(IcebergRead.read(spark, t).filter(col("par").isNull)
      .select(col("id")).as[Long].collect().toSet == Set(2L, 4L))
    // dynamic overwrite of the null tuple replaces only the null rows
    IcebergWrite.write(Seq((9L, null: String)).toDF("id", "par"), t,
      mode = "overwritePartitions")
    assert(IcebergRead.read(spark, t).select(col("id")).as[Long]
      .collect().toSet == Set(1L, 3L, 9L))
  }

  test("pruning stays sound: null tuples, unknown transforms, IsNull") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    val fields = Seq(PartField("id_bucket", "id", Bucket(8)))
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, IsNull, IsNotNull, Literal}
    val idAttr = AttributeReference("id", LongType)()
    val b42 = (hashLong(42L) & Int.MaxValue) % 8
    // right bucket keeps, wrong bucket prunes
    assert(keepFile(fields, schema, Map("id_bucket" -> b42.toString),
      Seq(EqualTo(idAttr, Literal(42L)))))
    assert(!keepFile(fields, schema, Map("id_bucket" -> ((b42 + 1) % 8).toString),
      Seq(EqualTo(idAttr, Literal(42L)))))
    // NULL tuple = all-null source: equality prunes, IsNull keeps
    assert(!keepFile(fields, schema, Map("id_bucket" -> null),
      Seq(EqualTo(idAttr, Literal(42L)))))
    assert(keepFile(fields, schema, Map("id_bucket" -> null), Seq(IsNull(idAttr))))
    assert(!keepFile(fields, schema, Map("id_bucket" -> null), Seq(IsNotNull(idAttr))))
    assert(!keepFile(fields, schema, Map("id_bucket" -> b42.toString),
      Seq(IsNull(idAttr))))
    // absent tuple field / opaque transform / non-monotonic range: keep
    assert(keepFile(fields, schema, Map.empty, Seq(EqualTo(idAttr, Literal(42L)))))
    assert(keepFile(Seq(PartField("x", "id", Opaque("v9"))), schema,
      Map("x" -> "7"), Seq(EqualTo(idAttr, Literal(42L)))))
    import org.apache.spark.sql.catalyst.expressions.GreaterThan
    assert(keepFile(fields, schema, Map("id_bucket" -> "0"),
      Seq(GreaterThan(idAttr, Literal(42L))))) // bucket is not monotonic
  }
}
