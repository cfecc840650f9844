package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.runtime.TxLogTable
import graft.streaming.StreamingLoaders

/** Driver-visible Structured Streaming rows (SURVEY §2.10).
  *
  * The streaming surface was previously unit-only: nothing in the
  * CORRECTNESS compare exercised a foreachBatch load end-to-end. These
  * queries run REAL streaming queries (file source, one micro-batch per
  * staged file, `Trigger.AvailableNow`) against a temp warehouse and
  * return the loaded tables, which the driver byte-compares to the
  * one-shot batch oracle — the reference's whole incremental contract
  * (`databricks/hub.sql:44,165-179`: each scheduled run stages the delta
  * and loads it against `{{ this }}`) replayed per micro-batch.
  *
  * Each query also WIPES THE CHECKPOINT and re-runs the stream, forcing a
  * full replay of every micro-batch. `foreachBatch` alone is
  * at-least-once; [[graft.runtime.TxLogTable.appendOnce]] must recognize
  * the replayed `(appId, batchId)` pairs in the table's own log and skip
  * them, or the replay double-loads and the hash against the one-shot
  * oracle breaks. The replay is NOT vacuous: by the time it runs, the
  * satellite's latest hashdiff per key is the batch-2 value, so a
  * replayed batch-0 row LOOKS like a change to the incremental loader —
  * only the transaction marker stands between it and a duplicate row.
  */
object StreamingQueries {

  private def rmTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val c = Files.list(p)
      try c.iterator().forEachRemaining(q => rmTree(q)) finally c.close()
    }
    Files.deleteIfExists(p): Unit
  }

  /** Materialize the 3-batch staged customer source as THREE single-file
    * parquet "arrival" files with strictly increasing mtimes, so the file
    * stream source (`maxFilesPerTrigger=1`, oldest-first) delivers
    * exactly one staged batch per micro-batch in load order — the shape a
    * production landing zone has. Returns the staging dir. */
  private def writeArrivals(s: SparkSession, dir: String, wh: String): String = {
    val staged = DvQueries.cust3Batch(s, dir)
    val stagingDir = s"$wh/staging"
    Files.createDirectories(Paths.get(stagingDir))
    val t0 = System.currentTimeMillis()
    (0L to 2L).foreach { b =>
      val tmp = s"$wh/_b$b"
      staged.filter(col("b") === b).drop("b")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator()
      val src = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet part in $tmp"))
      val dst = Paths.get(stagingDir, f"batch$b%02d.parquet")
      Files.move(src, dst)
      // explicit, strictly-increasing mtimes: micro-batch ORDER is part of
      // the incremental contract (a later batch may only add keys/changes),
      // and the source orders its file queue by modification time
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(t0 + b * 60000))
      rmTree(Paths.get(tmp))
    }
    stagingDir
  }

  private def arrivalStream(s: SparkSession, stagingDir: String,
                            schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagingDir)

  val all: Seq[Q] = Seq(

    // §2.10 DRIVER-VISIBLE: 3-micro-batch hub+sat vault load through the
    // incremental loaders + appendOnce, then a checkpoint-wipe full
    // replay. Result must byte-equal the one-shot batch build.
    Q("streaming_vault_roundtrip",
      (s, dir) => {
        val wh = DvQueries.tmpWarehouse("graft_stream_vault")
        val schema = DvQueries.cust3Batch(s, dir).drop("b").schema
        val stagingDir = writeArrivals(s, dir, wh)
        val txlog = new TxLogTable(s, s"$wh/vault")
        def runStream(): Unit = {
          val q = StreamingLoaders.vaultSink(
            arrivalStream(s, stagingDir, schema), txlog,
            hubName = "hub_customer", satName = "sat_customer",
            hashkey = "hk_customer_h", businessKeys = Seq("custkey"),
            bkColumns = Seq("c_custkey"),
            hashdiff = "hd_customer_s",
            payload = Seq("c_name", "c_acctbal_v", "c_mktsegment"),
            checkpoint = s"$wh/_cp", appId = Some("stream_vault_rt")).start()
          q.processAllAvailable(); q.stop()
        }
        runStream()
        // checkpoint gone → the source re-delivers ALL batches from batchId
        // 0; the tables' (appId, batchId) markers must absorb every one
        rmTree(Paths.get(s"$wh/_cp"))
        runStream()
        val hub = txlog.read("hub_customer")
          .select(col("hk_customer_h"), col("custkey"),
            col("ldts").as("hub_ldts"))
        val sat = txlog.read("sat_customer")
        hub.join(sat, "hk_customer_h")
          .select(col("hk_customer_h"), col("custkey"), col("hub_ldts"),
            col("hd_customer_s"), col("rsrc"), col("ldts"),
            col("c_name"), col("c_acctbal_v"), col("c_mktsegment"))
      },
      Some(s"""WITH ${DvQueries.satV0Sql},
              |hub AS (
              |  SELECT hk_customer_h, c_custkey AS custkey, ldts AS hub_ldts FROM hashed
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY hk_customer_h ORDER BY ldts) = 1)
              |SELECT h.hk_customer_h, h.custkey, h.hub_ldts,
              |       s.hd_customer_s, s.rsrc, s.ldts,
              |       s.c_name, s.c_acctbal_v, s.c_mktsegment
              |FROM hub h JOIN sat_v0 s ON s.hk_customer_h = h.hk_customer_h""".stripMargin)),

    // §2.10 + S7: the raw exactly-once landing sink (txLogSink). A plain
    // append sink has NO incremental anti-join to save it — without the
    // transaction markers the checkpoint-wipe replay triples the table.
    Q("streaming_txlog_exactly_once",
      (s, dir) => {
        val wh = DvQueries.tmpWarehouse("graft_stream_txlog")
        val schema = DvQueries.cust3Batch(s, dir).drop("b").schema
        val stagingDir = writeArrivals(s, dir, wh)
        val txlog = new TxLogTable(s, s"$wh/vault")
        def runStream(): Unit = {
          val q = StreamingLoaders.txLogSink(
            arrivalStream(s, stagingDir, schema), txlog, "staged_customer",
            checkpoint = s"$wh/_cp", appId = Some("stream_txlog_eo")).start()
          q.processAllAvailable(); q.stop()
        }
        runStream()
        rmTree(Paths.get(s"$wh/_cp"))
        runStream()
        txlog.read("staged_customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
            col("ldts"), col("rsrc"), col("c_acctbal_v"),
            col("hk_customer_h"), col("hd_customer_s"))
      },
      Some(s"""WITH ${DvQueries.satV0Sql}
              |SELECT c_custkey, c_name, c_mktsegment, ldts, rsrc, c_acctbal_v,
              |       hk_customer_h, hd_customer_s
              |FROM hashed""".stripMargin)))
}
