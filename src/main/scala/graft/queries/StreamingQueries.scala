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

  /** One single-file parquet "arrival" with an explicit, strictly
    * increasing mtime: micro-batch ORDER is part of the incremental
    * contract (a later batch may only add keys/changes), and the file
    * stream source (`maxFilesPerTrigger=1`, oldest-first) orders its
    * queue by modification time. */
  private def writeOneFile(df: DataFrame, wh: String, stagingDir: String,
                           idx: Int, t0: Long): Unit = {
    val tmp = s"$wh/_b$idx"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val list = Files.list(Paths.get(tmp))
    val src =
      try list.iterator().asScalaLike
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet part in $tmp"))
      finally list.close()
    val dst = Paths.get(stagingDir, f"batch$idx%02d.parquet")
    Files.move(src, dst)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(t0 + idx * 60000))
    rmTree(Paths.get(tmp))
  }

  private implicit class IterOps[A](private val it: java.util.Iterator[A]) {
    def asScalaLike: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  /** Materialize the 3-batch staged customer source as THREE single-file
    * parquet arrivals — the shape a production landing zone has. Returns
    * the staging dir and the staged row count (the state-volume hint for
    * `StreamingLoaders.shardsFor`). */
  private def writeArrivals(s: SparkSession, dir: String, wh: String): (String, Long) = {
    val staged = DvQueries.cust3Batch(s, dir)
    val stagingDir = s"$wh/staging"
    Files.createDirectories(Paths.get(stagingDir))
    val t0 = System.currentTimeMillis()
    (0 to 2).foreach { b =>
      writeOneFile(staged.filter(col("b") === b.toLong).drop("b"),
        wh, stagingDir, b, t0)
    }
    (stagingDir, staged.count())
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
        val (stagingDir, stagedRows) = writeArrivals(s, dir, wh)
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
        // 3-batch harness stream: state/shuffle shards scoped to its
        // volume (see StreamingLoaders.shardsFor — a checkpoint property)
        StreamingLoaders.withStateShards(s, StreamingLoaders.shardsFor(stagedRows)) {
          runStream()
          // checkpoint gone → the source re-delivers ALL batches from batchId
          // 0; the tables' (appId, batchId) markers must absorb every one
          rmTree(Paths.get(s"$wh/_cp"))
          runStream()
        }
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

    // §2.10 STATE-STORE PATH: the stateful satellite sink — per-key latest
    // hashdiff lives in flatMapGroupsWithState state (O(keys-in-batch)
    // lookups, not the batch loader's O(target) NOT-EXISTS scan). The
    // checkpoint wipe is the sharpest replay here: it resets the STATE
    // too, so on the second run every batch-0 row looks brand-new to the
    // change detector — only the txn markers stand between the replay and
    // a tripled satellite.
    Q("streaming_sat_stateful",
      (s, dir) => {
        val wh = DvQueries.tmpWarehouse("graft_stream_satst")
        val schema = DvQueries.cust3Batch(s, dir).drop("b").schema
        val (stagingDir, stagedRows) = writeArrivals(s, dir, wh)
        val txlog = new TxLogTable(s, s"$wh/vault")
        def runStream(): Unit = {
          val q = StreamingLoaders.satV0StatefulTxSink(
            arrivalStream(s, stagingDir, schema), txlog, "sat_customer",
            hashkey = "hk_customer_h", hashdiff = "hd_customer_s",
            checkpoint = s"$wh/_cp", appId = Some("stream_sat_stateful")).start()
          q.processAllAvailable(); q.stop()
        }
        StreamingLoaders.withStateShards(s, StreamingLoaders.shardsFor(stagedRows)) {
          runStream()
          rmTree(Paths.get(s"$wh/_cp"))
          runStream()
        }
        txlog.read("sat_customer")
          .select(col("hk_customer_h"), col("hd_customer_s"), col("rsrc"),
            col("ldts"), col("c_name"), col("c_acctbal_v"), col("c_mktsegment"))
      },
      Some(s"""WITH ${DvQueries.satV0Sql}
              |SELECT hk_customer_h, hd_customer_s, rsrc, ldts,
              |       c_name, c_acctbal_v, c_mktsegment
              |FROM sat_v0""".stripMargin)),

    // §2.10 EVENT-TIME TIMERS: gap sessionization over the events table —
    // the continuous form of the batch event_sessions query, same 30-min
    // gap policy, byte-compared to the same gaps-and-islands oracle. A
    // session closes EITHER by an in-key gap or by event-time TIMEOUT
    // (idle key, no later event to observe the gap). Three ts-ordered
    // arrival files drive the watermark forward; a final sentinel arrival
    // (user −1, past every open timer) advances it far enough that every
    // tail session flushes — without it the last session of every user
    // would sit in the state store forever, which is exactly the
    // driver-invisible failure mode this row exists to catch.
    Q("streaming_sessionize",
      (s, dir) => {
        val wh = DvQueries.tmpWarehouse("graft_stream_sess")
        val ev = SimQueries.events(s, dir)
          .select(col("user_id").cast("long").as("user_id"),
            col("ts"), col("value").cast("double").as("value"))
        // one agg pass for the sentinel ts AND the state-volume hint
        val evHead = ev.agg(max(col("ts")), count(lit(1))).head()
        val maxTs = evHead.getTimestamp(0)
        val evRows = evHead.getLong(1)
        val sentinel = new java.sql.Timestamp(maxTs.getTime + 4 * 3600 * 1000L)
        val stagingDir = s"$wh/staging"
        Files.createDirectories(Paths.get(stagingDir))
        val cuts = Seq(
          (lit("0001-01-01").cast("timestamp"), lit("2024-01-11").cast("timestamp")),
          (lit("2024-01-11").cast("timestamp"), lit("2024-01-21").cast("timestamp")),
          (lit("2024-01-21").cast("timestamp"), lit("9999-01-01").cast("timestamp")))
        val t0 = System.currentTimeMillis()
        cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
          writeOneFile(ev.filter(col("ts") >= lo && col("ts") < hi), wh,
            stagingDir, i, t0)
        }
        import s.implicits._
        writeOneFile(Seq((-1L, sentinel, 0.0)).toDF("user_id", "ts", "value"),
          wh, stagingDir, cuts.size, t0)
        val txlog = new TxLogTable(s, s"$wh/out")
        StreamingLoaders.withStateShards(s, StreamingLoaders.shardsFor(evRows)) {
          val stream = arrivalStream(s, stagingDir, ev.schema)
            .withWatermark("ts", "0 seconds")
          val q = StreamingLoaders.sessionizeStream(stream, gap = "30 minutes")
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", s"$wh/_cp")
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
              txlog.appendOnce("sessions", batch, "stream_sessionize", batchId): Unit
            }.start()
          q.processAllAvailable(); q.stop()
        }
        txlog.read("sessions")
          .filter(col("user_id") >= 0)
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"), round(col("session_value"), 4).as("session_value"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, cast(ts AS TIMESTAMP) AS ts, value
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |numbered AS (
             |  SELECT user_id, ts, value,
             |    cast(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
             |  FROM flagged)
             |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             |  count(*) AS n_events, round(sum(value), 4) AS session_value
             |FROM numbered GROUP BY user_id, session_no""".stripMargin)),

    // §2.10 + S7: the raw exactly-once landing sink (txLogSink). A plain
    // append sink has NO incremental anti-join to save it — without the
    // transaction markers the checkpoint-wipe replay triples the table.
    Q("streaming_txlog_exactly_once",
      (s, dir) => {
        val wh = DvQueries.tmpWarehouse("graft_stream_txlog")
        val schema = DvQueries.cust3Batch(s, dir).drop("b").schema
        val (stagingDir, stagedRows) = writeArrivals(s, dir, wh)
        val txlog = new TxLogTable(s, s"$wh/vault")
        def runStream(): Unit = {
          val q = StreamingLoaders.txLogSink(
            arrivalStream(s, stagingDir, schema), txlog, "staged_customer",
            checkpoint = s"$wh/_cp", appId = Some("stream_txlog_eo")).start()
          q.processAllAvailable(); q.stop()
        }
        StreamingLoaders.withStateShards(s, StreamingLoaders.shardsFor(stagedRows)) {
          runStream()
          rmTree(Paths.get(s"$wh/_cp"))
          runStream()
        }
        txlog.read("staged_customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
            col("ldts"), col("rsrc"), col("c_acctbal_v"),
            col("hk_customer_h"), col("hd_customer_s"))
      },
      Some(s"""WITH ${DvQueries.satV0Sql}
              |SELECT c_custkey, c_name, c_mktsegment, ldts, rsrc, c_acctbal_v,
              |       hk_customer_h, hd_customer_s
              |FROM hashed""".stripMargin)),

    // §2.10 STREAMING DEDUP: `dropDuplicatesWithinWatermark` over an
    // event stream where later micro-batches RE-DELIVER a slice of
    // earlier ones (the at-least-once upstream every landing zone has).
    // Dedup state is keyed by event_id and bounded by the watermark
    // delay — the production contract is "duplicates arrive within D of
    // the original", and state is dropped once the watermark passes,
    // unlike an unbounded dropDuplicates. Here the delay exceeds the
    // 30-day event span so the dedup is exact, and the result must equal
    // the plain events table (each id exactly once) through BOTH the
    // first run and a checkpoint-wipe replay (fresh state + re-delivered
    // batches absorbed by the appendOnce txn markers).
    Q("streaming_dedup_watermark",
      (s, dir) => {
        val wh = DvQueries.tmpWarehouse("graft_stream_dedup")
        val ev = s.read.parquet(s"$dir/events.parquet")
          .select("event_id", "ts", "user_id", "event_type", "value")
        val stagingDir = s"$wh/staging"
        Files.createDirectories(Paths.get(stagingDir))
        val t0 = System.currentTimeMillis()
        val batches = Seq(
          ev.filter(col("event_id") % 3 === 0),
          ev.filter(col("event_id") % 3 === 1)
            .unionByName(ev.filter(col("event_id") % 3 === 0 &&
              col("event_id") % 5 === 0)),
          ev.filter(col("event_id") % 3 === 2)
            .unionByName(ev.filter(col("event_id") % 3 === 1 &&
              col("event_id") % 5 === 1)))
        batches.zipWithIndex.foreach { case (b, i) =>
          writeOneFile(b, wh, stagingDir, i, t0)
        }
        // dedup state holds every event_id inside the watermark — here the
        // delay exceeds the span, so the hint is the full event count
        val evRows = ev.count()
        val txlog = new TxLogTable(s, s"$wh/vault")
        def runStream(): Unit = {
          val deduped = arrivalStream(s, stagingDir, ev.schema)
            // the driver parquet is timestamp[us] NTZ; watermarks need LTZ
            // (session TZ is UTC, so the cast is value-preserving)
            .withColumn("ts", col("ts").cast("timestamp"))
            .withWatermark("ts", "90 days")
            .dropDuplicatesWithinWatermark("event_id")
          val q = StreamingLoaders.txLogSink(deduped, txlog, "events_dedup",
            checkpoint = s"$wh/_cp", appId = Some("stream_dedup_wm")).start()
          q.processAllAvailable(); q.stop()
        }
        StreamingLoaders.withStateShards(s, StreamingLoaders.shardsFor(evRows)) {
          runStream()
          rmTree(Paths.get(s"$wh/_cp"))
          runStream()
        }
        txlog.read("events_dedup")
          .select("event_id", "ts", "user_id", "event_type", "value")
      },
      Some("SELECT event_id, ts, user_id, event_type, value FROM events")),

    // §2.10 STREAM-STREAM JOIN: click→purchase attribution as Spark's
    // built-in watermarked stream-stream inner join with a time-range
    // condition (`click_ts ∈ [purchase_ts − 1 day, purchase_ts]`). Both
    // sides are independent file streams (separate landing zones, three
    // ts-ranged arrivals each); the range condition + watermarks are what
    // bound the join STATE in production — a click older than
    // watermark − 1 day can never match and is evicted. Here the delay
    // exceeds the 30-day event span so the result is exact and must equal
    // the batch interval join, through both the first run and a
    // checkpoint-wipe replay (fresh join state; re-emitted matches
    // absorbed by the appendOnce txn markers).
    Q("streaming_interval_join",
      (s, dir) => {
        val wh = DvQueries.tmpWarehouse("graft_stream_ij")
        val ev = s.read.parquet(s"$dir/events.parquet")
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"), col("value"))
        val clickDir = s"$wh/clicks"
        val purchDir = s"$wh/purchases"
        Files.createDirectories(Paths.get(clickDir))
        Files.createDirectories(Paths.get(purchDir))
        val cuts = Seq(
          (lit("0001-01-01").cast("timestamp"), lit("2024-01-11").cast("timestamp")),
          (lit("2024-01-11").cast("timestamp"), lit("2024-01-21").cast("timestamp")),
          (lit("2024-01-21").cast("timestamp"), lit("9999-01-01").cast("timestamp")))
        val t0 = System.currentTimeMillis()
        cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
          val slice = ev.filter(col("ts") >= lo && col("ts") < hi)
          writeOneFile(slice.filter(col("event_type") === "click"),
            wh, clickDir, i, t0)
          writeOneFile(slice.filter(col("event_type") === "purchase"),
            wh, purchDir, i, t0)
        }
        // join state holds both sides' rows inside the watermark — the
        // delay exceeds the span, so the hint is the full event count
        val evRows = ev.count()
        val txlog = new TxLogTable(s, s"$wh/vault")
        // a stream-stream join materializes FOUR state stores per shuffle
        // partition per micro-batch (left/right keyToNumValues +
        // keyWithIndexToValue); at the session's 32 partitions that is
        // 128 store lifecycles × 6 batches of pure fixed cost — scope the
        // shard count to the stream's volume (shardsFor).
        def runStream(): Unit = {
          val clicks = arrivalStream(s, clickDir, ev.schema)
            .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
              col("user_id"))
            .withWatermark("click_ts", "90 days")
          val purchases = arrivalStream(s, purchDir, ev.schema)
            .select(col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"), col("user_id").as("p_user"),
              col("value").as("pvalue"))
            .withWatermark("purchase_ts", "90 days")
          val joined = clicks.join(purchases,
            col("user_id") === col("p_user") &&
              col("click_ts") <= col("purchase_ts") &&
              col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 DAY"))
            .select(col("click_id"), col("purchase_id"), col("user_id"),
              col("click_ts"), col("purchase_ts"),
              round(col("pvalue"), 4).as("purchase_value"))
          val q = StreamingLoaders.txLogSink(joined, txlog, "attributed",
            checkpoint = s"$wh/_cp", appId = Some("stream_interval_join")).start()
          q.processAllAvailable(); q.stop()
        }
        StreamingLoaders.withStateShards(s, StreamingLoaders.shardsFor(evRows)) {
          runStream()
          rmTree(Paths.get(s"$wh/_cp"))
          runStream()
        }
        txlog.read("attributed")
          .select("click_id", "purchase_id", "user_id", "click_ts",
            "purchase_ts", "purchase_value")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |       c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
             |       round(p.value, 4) AS purchase_value
             |FROM events c JOIN events p ON c.user_id = p.user_id
             |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
             |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY""".stripMargin)),

    // STREAMING SOURCE OVER THE INTEROP SEAM (§2.18 stretch): tail a
    // GROWING Delta table's _delta_log as a Structured Streaming source
    // (streaming/DeltaTail — Spark's file stream over the commit JSONs,
    // one micro-batch per committed version, adds resolved to distributed
    // parquet reads with partition values restored). Exactly-once lands
    // on the Delta VERSION through TxLogTable.appendOnce: run 1 tails
    // v0+v1, the fixture GROWS by v2, run 2 resumes from the stream
    // checkpoint and picks up only v2, then the checkpoint is wiped and
    // run 3 redelivers everything — the version markers must absorb all
    // of it. The streamed table must equal the batch DeltaRead of the
    // head byte-for-byte (parity boolean) and the values are oracle-gated
    // against `orders` directly.
    Q("streaming_delta_tail",
      (s, dir) => {
        import graft.sources.{DeltaRead, DeltaWrite}
        import graft.streaming.DeltaTail
        val wh = DvQueries.tmpWarehouse("graft_delta_tail")
        val tbl = s"$wh/orders_delta"
        val o = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"))
        // disjoint append commits, so the final state is a clean union
        DeltaWrite.write(o.filter(col("o_orderkey") % 2 === 0), tbl,
          Seq("o_orderpriority"))
        DeltaWrite.write(o.filter(col("o_orderkey") % 2 === 1 &&
          col("o_orderpriority").isin("1-URGENT", "5-LOW")), tbl)
        val txlog = new TxLogTable(s, s"$wh/t")
        def runTail(): Unit = {
          val q = DeltaTail.stream(s, tbl, s"$wh/_cp",
            (df, v) => { txlog.appendOnce("orders_tail", df, "delta_tail", v): Unit })
          q.processAllAvailable(); q.stop()
        }
        runTail()                        // v0 + v1
        DeltaWrite.write(o.filter(col("o_orderkey") % 2 === 1 &&
          col("o_orderpriority") === "2-HIGH" && col("o_orderkey") % 3 === 0), tbl)
        runTail()                        // resumes, picks up v2 only
        rmTree(Paths.get(s"$wh/_cp"))
        runTail()                        // full redelivery — markers absorb
        val streamed = txlog.read("orders_tail")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        val batch = DeltaRead.read(s, tbl)
        val parity = streamed.exceptAll(batch).isEmpty &&
          batch.exceptAll(streamed).isEmpty
        streamed.groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
          .withColumn("batch_parity", lit(parity))
      },
      Some("""SELECT o_orderpriority AS priority,
             |  cast(count(*) AS BIGINT) AS n_orders,
             |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS total_cents,
             |  TRUE AS batch_parity
             |FROM orders
             |WHERE o_orderkey % 2 = 0
             |   OR (o_orderkey % 2 = 1 AND o_orderpriority IN ('1-URGENT', '5-LOW'))
             |   OR (o_orderkey % 2 = 1 AND o_orderpriority = '2-HIGH'
             |       AND o_orderkey % 3 = 0)
             |GROUP BY 1""".stripMargin)),

    // CDF STREAMING TAIL (DeltaTail.streamChanges): the MoR completion of
    // streaming_delta_tail — a downstream that must MIRROR a table with
    // deletes cannot use the append-only tail (it fails loudly at the
    // first DV commit); the CDF tail serves every version as CHANGE
    // batches (_change_type / _commit_version) through readChangeFeed's
    // per-version synthesis + cdc machinery. Exactly-once lands on the
    // commit version via TxLogTable.appendOnce across a resume AND a
    // checkpoint wipe + full redelivery. The mirror identity (inserts
    // exceptAll deletes == batch head read) and the per-type aggregates
    // are oracle-gated against `orders` directly.
    Q("streaming_delta_cdf",
      (s, dir) => {
        import graft.sources.{DeltaRead, DeltaWrite}
        import graft.streaming.DeltaTail
        val wh = DvQueries.tmpWarehouse("graft_delta_cdf_tail")
        val tbl = s"$wh/orders_delta"
        val o = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"))
        DeltaWrite.write(o.filter(col("o_orderkey") % 2 === 0), tbl,
          Seq("o_orderpriority"))                                        // v0
        DeltaWrite.setProperties(s, tbl,
          Map("delta.enableChangeDataFeed" -> "true"))                   // v1
        DeltaWrite.write(o.filter(col("o_orderkey") % 2 === 1 &&
          col("o_orderpriority").isin("1-URGENT", "5-LOW")), tbl)        // v2
        val txlog = new TxLogTable(s, s"$wh/t")
        def runTail(): Unit = {
          val q = DeltaTail.streamChanges(s, tbl, s"$wh/_cp",
            (df, v) => { txlog.appendOnce("orders_changes", df, "cdf_tail", v): Unit })
          q.processAllAvailable(); q.stop()
        }
        runTail()                                    // v0 + v2 (v1 is empty)
        DeltaWrite.deleteWhere(s, tbl, col("o_orderkey") % 5 === 0)      // v3
        runTail()                                    // resumes: v3's deletes
        rmTree(Paths.get(s"$wh/_cp"))
        runTail()                                    // redelivery — absorbed
        val changes = txlog.read("orders_changes")
        val dataCols = Seq("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority").map(col)
        val mirror = changes.filter(col("_change_type") === "insert")
          .select(dataCols: _*)
          .exceptAll(changes.filter(col("_change_type") === "delete")
            .select(dataCols: _*))
        val head = DeltaRead.read(s, tbl)
          .select(dataCols: _*)
        val parity = mirror.exceptAll(head).isEmpty && head.exceptAll(mirror).isEmpty
        changes.groupBy(col("_change_type").as("change_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
          .withColumn("mirror_parity", lit(parity))
      },
      Some("""WITH ins AS (
             |  SELECT * FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT * FROM orders WHERE o_orderkey % 2 = 1
             |    AND o_orderpriority IN ('1-URGENT', '5-LOW'))
             |SELECT 'insert' AS change_type,
             |  cast(count(*) AS BIGINT) AS n_rows,
             |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS total_cents, TRUE AS mirror_parity
             |FROM ins
             |UNION ALL
             |SELECT 'delete', cast(count(*) AS BIGINT),
             |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
             |  TRUE
             |FROM ins WHERE o_orderkey % 5 = 0""".stripMargin)),

    // ICEBERG STREAMING TAIL (streaming/IcebergTail): the other format's
    // DeltaTail — Spark's file stream over the versioned metadata JSONs,
    // new snapshots discovered by DIFFING each arriving version's
    // snapshots array against its on-disk predecessor (restart-safe, no
    // stream-side state), appended files read straight from the new
    // snapshot's status-1 manifest entries. Exactly-once lands on the
    // snapshot id via TxLogTable.appendOnce across a resume AND a
    // checkpoint wipe + full redelivery. A post-redelivery
    // expireSnapshots(keepLast=1) commits a metadata version with NO new
    // snapshot — the diff must serve it as a no-op, not a redelivery.
    // Parity vs the batch IcebergRead of the head rides as a boolean;
    // values are oracle-gated against `orders` directly.
    Q("streaming_iceberg_tail",
      (s, dir) => {
        import graft.sources.{IcebergRead, IcebergWrite}
        import graft.streaming.IcebergTail
        val wh = DvQueries.tmpWarehouse("graft_iceberg_tail")
        val tbl = s"$wh/orders_ice"
        val o = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"))
        IcebergWrite.write(o.filter(col("o_orderkey") % 2 === 0), tbl)   // s1
        IcebergWrite.write(o.filter(col("o_orderkey") % 2 === 1 &&
          col("o_orderkey") % 3 === 0), tbl)                             // s2
        val txlog = new TxLogTable(s, s"$wh/t")
        def runTail(): Unit = {
          val q = IcebergTail.stream(s, tbl, s"$wh/_cp",
            (df, sid) => { txlog.appendOnce("orders_tail", df, "ice_tail", sid): Unit })
          q.processAllAvailable(); q.stop()
        }
        runTail()                          // s1 + s2
        IcebergWrite.write(o.filter(col("o_orderkey") % 2 === 1 &&
          col("o_orderkey") % 3 === 1), tbl)                             // s3
        runTail()                          // resumes, picks up s3 only
        rmTree(Paths.get(s"$wh/_cp"))
        runTail()                          // full redelivery — markers absorb
        // expiry AFTER the redelivery window: it physically deletes the
        // expired snapshots' manifests, so a checkpoint wipe could no
        // longer replay them (Iceberg's own streaming sources share that
        // contract — expiry bounds replayability); the metadata version
        // it commits carries NO new snapshot, which the diff must serve
        // as a NO-OP to the still-running checkpointed tail
        IcebergWrite.expireSnapshots(tbl, keepLast = 1)
        runTail()                          // expiry arrival: no-op
        val streamed = txlog.read("orders_tail")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        val batch = IcebergRead.read(s, tbl)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        val parity = streamed.exceptAll(batch).isEmpty &&
          batch.exceptAll(streamed).isEmpty
        streamed.groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
          .withColumn("batch_parity", lit(parity))
      },
      Some("""SELECT o_orderpriority AS priority,
             |  cast(count(*) AS BIGINT) AS n_orders,
             |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS total_cents,
             |  TRUE AS batch_parity
             |FROM orders
             |WHERE o_orderkey % 2 = 0
             |   OR (o_orderkey % 2 = 1 AND o_orderkey % 3 IN (0, 1))
             |GROUP BY 1""".stripMargin)),

    // ICEBERG CHANGELOG STREAMING TAIL (IcebergTail.streamChanges): the
    // MoR completion on the Iceberg side — a downstream that must
    // MIRROR a table with deletes cannot use the append-only tail; the
    // changelog tail serves every new snapshot as CHANGE batches
    // (_change_type/_snapshot_id) through readChanges' per-snapshot
    // classification. Exactly-once on the snapshot id via
    // TxLogTable.appendOnce across a resume AND a checkpoint wipe +
    // full redelivery; mirror identity (inserts∖deletes == batch head)
    // and per-type aggregates oracle-gated against `orders`.
    Q("streaming_iceberg_changes",
      (s, dir) => {
        import graft.sources.{IcebergRead, IcebergWrite}
        import graft.streaming.IcebergTail
        val wh = DvQueries.tmpWarehouse("graft_ice_changes_tail")
        val tbl = s"$wh/orders_ice"
        val o = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"))
        IcebergWrite.write(o.filter(col("o_orderkey") % 2 === 0), tbl)   // s1
        IcebergWrite.write(o.filter(col("o_orderkey") % 2 === 1 &&
          col("o_orderpriority").isin("1-URGENT", "5-LOW")), tbl)        // s2
        val txlog = new TxLogTable(s, s"$wh/t")
        def runTail(): Unit = {
          val q = IcebergTail.streamChanges(s, tbl, s"$wh/_cp",
            (df, sid) => { txlog.appendOnce("orders_changes", df, "ice_cdc", sid): Unit })
          q.processAllAvailable(); q.stop()
        }
        runTail()                                    // s1 + s2 inserts
        IcebergWrite.deleteWhere(s, tbl, col("o_orderkey") % 5 === 0)    // s3
        runTail()                                    // resumes: s3's deletes
        rmTree(Paths.get(s"$wh/_cp"))
        runTail()                                    // redelivery — absorbed
        val changes = txlog.read("orders_changes")
        val dataCols = Seq("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority").map(col)
        val mirror = changes.filter(col("_change_type") === "insert")
          .select(dataCols: _*)
          .exceptAll(changes.filter(col("_change_type") === "delete")
            .select(dataCols: _*))
        val head = IcebergRead.read(s, tbl).select(dataCols: _*)
        val parity = mirror.exceptAll(head).isEmpty && head.exceptAll(mirror).isEmpty
        changes.groupBy(col("_change_type").as("change_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
          .withColumn("mirror_parity", lit(parity))
      },
      Some("""WITH ins AS (
             |  SELECT * FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT * FROM orders WHERE o_orderkey % 2 = 1
             |    AND o_orderpriority IN ('1-URGENT', '5-LOW'))
             |SELECT 'insert' AS change_type,
             |  cast(count(*) AS BIGINT) AS n_rows,
             |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS total_cents, TRUE AS mirror_parity
             |FROM ins
             |UNION ALL
             |SELECT 'delete', cast(count(*) AS BIGINT),
             |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
             |  TRUE
             |FROM ins WHERE o_orderkey % 5 = 0""".stripMargin)))
}
