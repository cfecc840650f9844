package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.runtime.TxLogTable

/** Incremental MinHash+LSH near-dup candidate maintenance over a
  * transactional store — the 100 TB shape of the batch chain in
  * `graft.queries.TextQueries`: when a corpus grows by batches, re-shingling
  * and re-bucketing ALL of it per arrival is O(corpus) each time, while the
  * information that changed is O(batch). `ingest` computes signatures for
  * the NEW documents only ([[MinHash.signatures]] — byte-identical to the
  * one-shot chain), joins their band buckets against the stored membership
  * of exactly those TOUCHED buckets, and appends three deltas:
  *
  *  - `<prefix>_bands` (doc_id, band, bucket) — cumulative bucket membership,
  *  - `<prefix>_pairs` (doc_id, doc_id_2, band, bucket) — candidate pairs
  *    tagged by the generating bucket (the later-arriving member emits),
  *  - `<prefix>_dead`  (band, bucket) — buckets whose cumulative membership
  *    crossed the degenerate-bucket cap. Death is PERMANENT (membership only
  *    grows), so pairs of a dead bucket — including ones emitted before the
  *    crossing — are retracted retroactively by tag, exactly the batch
  *    operator's `count <= cap` semantics and the streaming operator's
  *    tombstone ([[graft.streaming.StreamingLoaders.lshCandidatesStream]]).
  *
  * [[candidates]] then equals the one-shot batch candidate set over the
  * union of all ingested batches: signatures/buckets are deterministic
  * per-document, membership is the union of batch memberships, a bucket is
  * dead iff its FINAL size exceeds the cap, and every co-bucketed pair is
  * emitted by whichever member arrived later — the `lsh_incremental` driver
  * query asserts this equivalence against the DuckDB one-shot oracle.
  *
  * Scale: per ingest the shingle/signature work is O(new docs), and the
  * joins shuffle only the members of touched buckets (the semi join against
  * the batch's (band, bucket) set restricts the stored side before any
  * pair blow-up; the cap bounds any single bucket's contribution). The one
  * full pass over `<prefix>_bands` per ingest is a narrow 3-column scan of
  * the index table — small next to the corpus — and disappears entirely if
  * the store lays bands out bucketed by `bucket`. Each append is
  * exactly-once ([[TxLogTable.appendOnce]] keyed by the caller's monotone
  * `batchId`), and the delta computation reads only committed state with a
  * replay guard (a batch's own doc ids are excluded from the "existing"
  * side), so a crash between the three appends resumes idempotently: every
  * order of partial commits recomputes the same deltas, already-committed
  * tables skip as replays, missing ones fill in.
  *
  * Contract: each document id arrives in exactly one batch (replays of the
  * same batchId are fine; the same doc in two DIFFERENT batches would
  * double-count its bucket membership).
  */
object IncrementalLsh {

  private def bandsT(p: String) = s"${p}_bands"
  private def pairsT(p: String) = s"${p}_pairs"
  private def deadT(p: String) = s"${p}_dead"

  /** Ingest one batch of documents (`idCol`, `textCol`) into the candidate
    * state under `prefix`. `cap` is the degenerate-bucket cap, matching the
    * batch operator's `MaxBucketSize`. */
  def ingest(store: TxLogTable, prefix: String, batch: DataFrame,
             batchId: Long, cap: Int = 100,
             idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val appId = s"lsh_inc=$prefix"
    val newBands = MinHash.bands(MinHash.signatures(batch, idCol, textCol), idCol)
      .withColumnRenamed(idCol, "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = newBands.select("band", "bucket").distinct()
      val newIds = newBands.select("doc_id").distinct()
      // committed members of the touched buckets only; a crashed-and-replayed
      // batch may have already committed its bands, so its own docs must not
      // count as pre-existing (they'd pair with themselves and double-count)
      val existing = store.readIfExists(bandsT(prefix)).map(
        _.join(touched, Seq("band", "bucket"), "left_semi")
          .join(newIds, Seq("doc_id"), "left_anti"))
      // three consumers (overflow count + both sides of the pair self-join)
      // would each re-scan the stored bands — persist the touched-bucket
      // membership once per ingest; it is O(touched buckets), not O(corpus)
      val members = existing
        .map(_.withColumn("is_new", lit(false))
          .unionByName(newBands.withColumn("is_new", lit(true))))
        .getOrElse(newBands.withColumn("is_new", lit(true)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deadBefore = store.readIfExists(deadT(prefix))
      val overflowed = members.groupBy("band", "bucket")
        .agg(count(lit(1)).as("n")).filter(col("n") > cap)
        .select("band", "bucket")
      val newlyDead =
        deadBefore.fold(overflowed)(d => overflowed.join(d, Seq("band", "bucket"), "left_anti"))
      val deadNow = deadBefore.fold(overflowed)(_.unionByName(overflowed))
      // every pair with at least one NEW member, tagged by generating bucket;
      // pairs of already/now-dead buckets are never materialized
      val right = members.select(col("doc_id").as("doc_id_2"), col("band"),
        col("bucket"), col("is_new").as("is_new_2"))
      val emit = members.join(right, Seq("band", "bucket"))
        .filter(col("doc_id") < col("doc_id_2") &&
          (col("is_new") || col("is_new_2")))
        .select("doc_id", "doc_id_2", "band", "bucket")
        .join(deadNow, Seq("band", "bucket"), "left_anti")
        .select("doc_id", "doc_id_2", "band", "bucket")
      try {
        // REBALANCE before each append (guide §6): the delta frames inherit
        // the persisted batch's partitioning (cached plans keep their
        // partition count), so an unhinted write emits one near-empty file
        // per partition per commit — at fixture scale 32 tiny files per
        // append, at any scale files sized by upstream parallelism instead
        // of bytes. The AQE rebalance shuffle re-sizes output partitions by
        // bytes, so the index tables accumulate compact files and every
        // later touched-bucket probe opens O(data) files, not O(commits ×
        // upstream partitions).
        store.appendOnce(pairsT(prefix), emit.hint("rebalance"), appId, batchId)
        store.appendOnce(deadT(prefix), newlyDead.hint("rebalance"), appId, batchId)
        store.appendOnce(bandsT(prefix), newBands.hint("rebalance"), appId, batchId)
        ()
      } finally { members.unpersist(blocking = false); () }
    } finally { newBands.unpersist(blocking = false); () }
  }

  /** OPTIMIZE the candidate state between ingests: range-clustered
    * compaction of the append-accumulated tables ([[TxLogTable.compact]])
    * with per-file `bucket` min/max stats registered first, so compacted
    * files carry tight bucket-hash ranges — the layout that lets a future
    * probe skip files whose range misses every touched bucket, and that
    * keeps the per-ingest scan from degrading as small append batches
    * accumulate. Readers are snapshot-isolated; results are unchanged by
    * construction (same rows, new layout) and the spec asserts it. */
  def optimize(store: TxLogTable, prefix: String, targetFiles: Int = 4): Unit = {
    // only the bands INDEX is probed by (band, bucket) — it gets the
    // clustered layout + per-file bucket stats; pairs/dead just bin-pack
    // (a stats pass is a full scan per table, and nothing range-probes
    // them)
    if (store.exists(bandsT(prefix))) {
      store.setStatsColumns(bandsT(prefix), Seq("bucket"))
      store.compact(bandsT(prefix), targetFiles, Seq("bucket"))
      ()
    }
    Seq(pairsT(prefix), deadT(prefix)).foreach { t =>
      if (store.exists(t)) { store.compact(t, targetFiles); () }
    }
  }

  /** The current candidate set: distinct (doc_id, doc_id_2) pairs with at
    * least one live generating bucket — equal to the one-shot batch
    * operator over everything ingested so far. */
  def candidates(store: TxLogTable, prefix: String): DataFrame = {
    val pairs = store.readIfExists(pairsT(prefix)).getOrElse(
      throw new IllegalStateException(
        s"IncrementalLsh.candidates: no ingested state under prefix '$prefix'"))
    store.readIfExists(deadT(prefix)).fold(pairs)(
        pairs.join(_, Seq("band", "bucket"), "left_anti"))
      .select("doc_id", "doc_id_2").distinct()
  }
}
