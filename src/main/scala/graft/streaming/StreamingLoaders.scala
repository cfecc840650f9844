package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.loaders.{EntitySource, HubLoader, SatV0Loader}
import graft.runtime.TableStore

/** Structured-Streaming front ends for the incremental loaders.
  *
  * The reference is batch/micro-batch only (scheduled `dbt run`; its HWM
  * filter is the watermark analogue — SURVEY §2.10). Our loaders are
  * per-micro-batch idempotent (dedup → anti-join against the target), which
  * makes them directly usable as `foreachBatch` sinks: each micro-batch is
  * one "delta load" in reference terms, and replays/late batches are
  * absorbed exactly like re-running a dbt incremental model.
  */
object StreamingLoaders {

  /** Continuously load a hub from a streaming staged source.
    * Usage: `hubSink(staged.writeStream, store, ...).start()` */
  def hubSink(
      staged: DataFrame,
      store: TableStore,
      targetName: String,
      hashkey: String,
      hkColumn: String,
      businessKeys: Seq[String],
      bkColumns: Seq[String],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    staged.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val recs = HubLoader.records(
          Seq(EntitySource(batch, Some(hkColumn), bkColumns)),
          hashkey, businessKeys, store.readIfExists(targetName),
          // HWM is meaningless inside a single micro-batch — the anti-join
          // carries the idempotence; checkpointing carries exactly-once
          disableHwm = true)
        store.append(targetName, recs)
      }

  /** Continuously load a v0 satellite. Change-dedup (LAG) runs within each
    * micro-batch; the cross-batch change check is the anti-join against the
    * target's latest (hashkey, hashdiff) — same contract as the batch
    * loader's NOT EXISTS (sat_v0.sql:131-142). */
  def satV0Sink(
      staged: DataFrame,
      store: TableStore,
      targetName: String,
      hashkey: String,
      hashdiff: String,
      payload: Seq[String],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    staged.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val recs = SatV0Loader.records(batch, Seq(hashkey), Some(hashdiff),
          payload, store.readIfExists(targetName), disableHwm = true)
        store.append(targetName, recs)
      }
}
