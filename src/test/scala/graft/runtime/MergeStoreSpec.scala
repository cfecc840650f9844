package graft.runtime

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.HashConfig

/** Copy-on-write maintenance contract: MERGE and targeted rehash rewrite
  * ONLY the partitions containing affected rows — the property that keeps
  * S7 at O(delta) instead of O(table) on a 100 TB vault. */
class MergeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("mergePartitioned rewrites only affected partitions (O(delta) files)") {
    val wh = Files.createTempDirectory("graft_merge").toString
    val store = new TableStore(spark, wh)
    val base = Seq(
      ("k1", "A", "2024-01-01"), ("k2", "B", "2024-01-01"),
      ("k3", "C", "2024-01-02"), ("k4", "D", "2024-01-03"))
      .toDF("bk", "payload", "pday")
    store.overwritePartitioned("t", base, "pday")
    val before = parquetFiles(store.pathOf("t"))

    // replace k1, insert k9 — both in pday=2024-01-01; plus a brand-new partition
    val delta = Seq(
      ("k1", "A2", "2024-01-01"), ("k9", "Z", "2024-01-01"),
      ("k5", "E", "2024-01-04"))
      .toDF("bk", "payload", "pday")
    store.mergePartitioned("t", "pday", delta, Seq("bk"))

    val after = parquetFiles(store.pathOf("t"))
    val untouchedBefore = before.filter(!_._1.contains("pday=2024-01-01"))
    val untouchedAfter = after.filter(f =>
      !f._1.contains("pday=2024-01-01") && !f._1.contains("pday=2024-01-04"))
    assert(untouchedAfter == untouchedBefore,
      "files outside the affected partitions must be byte-identical (same path+mtime)")

    val got = store.read("t").select("bk", "payload").as[(String, String)].collect().toSet
    assert(got == Set(("k1", "A2"), ("k2", "B"), ("k3", "C"), ("k4", "D"),
      ("k9", "Z"), ("k5", "E")))
    store.drop("t")
  }

  test("rehashEntityPartitioned rehashes one partition, leaves others on disk") {
    implicit val md5: HashConfig = HashConfig()
    val sha = HashConfig(algorithm = "SHA256")
    val wh = Files.createTempDirectory("graft_rehash_p").toString
    val store = new TableStore(spark, wh)
    val hub = Seq(("k1", "2024-01-01"), ("k2", "2024-01-02"), ("k3", "2024-01-03"))
      .toDF("bk", "pday")
      .withColumn("hk", graft.expr.Hashing.hashkey(Seq($"bk")))
    store.overwritePartitioned("h", hub, "pday")
    val before = parquetFiles(store.pathOf("h"))

    Rehasher.rehashEntityPartitioned(store, "h", "pday", "hk", Seq("bk"),
      md5, sha, affected = col("pday") === "2024-01-02")

    val after = parquetFiles(store.pathOf("h"))
    assert(after.filter(!_._1.contains("pday=2024-01-02")) ==
      before.filter(!_._1.contains("pday=2024-01-02")))
    val rows = store.read("h").select("bk", "hk").as[(String, String)].collect().toMap
    val wantSha = Seq("k2").toDF("b")
      .select(graft.expr.Hashing.hashkey(Seq($"b"))(sha)).head().getString(0)
    val wantMd5 = Seq("k1").toDF("b")
      .select(graft.expr.Hashing.hashkey(Seq($"b"))(md5)).head().getString(0)
    assert(rows("k2") == wantSha && rows("k1") == wantMd5)
    store.drop("h")
  }

  test("rehashAll keeps checkpoint maps and fails loudly on orphan child keys") {
    implicit val md5: HashConfig = HashConfig()
    val sha = HashConfig(algorithm = "SHA256")
    val wh = Files.createTempDirectory("graft_rehash_f").toString
    val store = new TableStore(spark, wh)
    val hub = Seq("k1").toDF("bk")
      .withColumn("hk_h", graft.expr.Hashing.hashkey(Seq($"bk")))
    store.overwrite("hub_x", hub)
    // satellite with one row whose hashkey has NO hub parent (orphan)
    val sat = Seq(("k1", "A"), ("ORPHAN", "B")).toDF("bk0", "payload")
      .withColumn("hk_h",
        when($"bk0" === "ORPHAN", lit("deadbeef" * 4))
          .otherwise(graft.expr.Hashing.hashkey(Seq($"bk0"))))
      .withColumn("ldts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("hd", graft.expr.Hashing.hashdiff(Seq($"payload")))
      .drop("bk0")
    store.overwrite("sat_x", sat)

    val e = intercept[Exception] {
      Rehasher.rehashAll(store,
        hubs = Seq(Rehasher.HubRehash("hub_x", "hk_h", Seq("bk"))),
        links = Nil,
        sats = Seq(Rehasher.SatRehash("sat_x", "hk_h", Some("hd"), Seq("payload"), "hub_x")),
        oldCfg = md5, newCfg = sha)
    }
    assert(e.getMessage != null)
    // the durable old→new map must SURVIVE the failure (recovery path)
    assert(store.exists("__rehash_map_hub_x"),
      "checkpoint map must be kept after a mid-rehash failure")
    // the satellite was not clobbered (rewrite materializes before swap)
    assert(store.read("sat_x").count() == 2)
    store.drop("hub_x"); store.drop("sat_x"); store.drop("__rehash_map_hub_x")
  }

  test("exists() detects partitioned tables (data files one level down)") {
    val wh = Files.createTempDirectory("graft_exists").toString
    val store = new TableStore(spark, wh)
    assert(!store.exists("p"))
    store.overwritePartitioned("p",
      Seq(("a", "2024-01-01")).toDF("v", "pday"), "pday")
    assert(store.exists("p"))
    store.drop("p")
  }

  test("partitionValues decodes multi-byte UTF-8 escapes") {
    // Hive-escaped dir names are pure ASCII on disk (%XX per UTF-8 BYTE);
    // create them directly — the container locale can't host raw non-ASCII
    // filenames, and escaped names never need them
    val wh = Files.createTempDirectory("graft_utf8").toString
    val store = new TableStore(spark, wh)
    val t = new java.io.File(store.pathOf("u")); t.mkdirs()
    assert(new java.io.File(t, "p=%E6%97%A5%E6%9C%AC").mkdir()) // 日本
    assert(new java.io.File(t, "p=a%3Ab").mkdir())              // a:b (single-byte escape)
    assert(new java.io.File(t, "p=plain").mkdir())
    assert(store.partitionValues("u", "p").toSet == Set("日本", "a:b", "plain"))
    assert(store.dropPartitions("u", "p", Seq("日本")) == 1L)
    assert(store.partitionValues("u", "p").toSet == Set("a:b", "plain"))
    store.drop("u")
  }

  test("overwriteBucketed is safe when df derives from the table it replaces") {
    val wh = Files.createTempDirectory("graft_bucket_self").toString
    val store = new TableStore(spark, wh)
    val df = (1 to 10).map(i => (s"hk$i", i)).toDF("hk", "v")
      .withColumn("ldts", to_timestamp(lit("2024-01-01 00:00:00")))
    try {
      store.overwriteBucketed("b_self", df, "hk", 2, "ldts")
      val derived = store.readTable("b_self").filter($"v" <= 5)
      store.overwriteBucketed("b_self", derived, "hk", 2, "ldts")
      assert(store.readTable("b_self").count() == 5)
      // bucket metadata survives the swap (DDL-recreated table)
      val cat = spark.sql("DESCRIBE EXTENDED b_self").collect().map(_.mkString("|")).mkString("\n")
      assert(cat.contains("Num Buckets") || cat.contains("bucket"), cat)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_self")
      store.drop("b_self")
    }
  }
}
