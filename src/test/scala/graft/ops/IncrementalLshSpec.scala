package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.runtime.TxLogTable

class IncrementalLshSpec extends SparkSpec {
  import spark.implicits._

  /** the one-shot batch semantics, computed directly: pairs of co-bucketed
    * docs restricted to buckets with final size <= cap */
  private def batchCandidates(docs: DataFrame, cap: Int): Set[(Long, Long)] = {
    val bands = MinHash.bands(MinHash.signatures(docs))
    val capped = bands.join(
      bands.groupBy("band", "bucket").count()
        .filter(col("count") <= cap).drop("count"),
      Seq("band", "bucket"), "left_semi")
    val b2 = capped.select(col("doc_id").as("doc_id_2"),
      col("band").as("band_2"), col("bucket").as("bucket_2"))
    capped.join(b2, col("bucket") === col("bucket_2") &&
        col("band") === col("band_2") && col("doc_id") < col("doc_id_2"))
      .select("doc_id", "doc_id_2").distinct()
      .as[(Long, Long)].collect().toSet
  }

  private def candSet(store: TxLogTable, prefix: String): Set[(Long, Long)] =
    IncrementalLsh.candidates(store, prefix)
      .as[(Long, Long)].collect().toSet

  // near-dup family: shared sentence with small suffix edits, plus distinct
  // background docs so buckets stay small
  private val corpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    (1L to 9L).map(i => i -> s"$base variant $i") ++
      (10L to 30L).map(i =>
        i -> (s"completely unrelated document number $i about topic ${i * 7} " +
          s"with words ${i * 13} ${i * 17} ${i * 19} ${i * 23} ${i * 29}"))
  }

  test("incremental over 3 batches equals the one-shot batch candidate set") {
    val docs = corpus.toDF("doc_id", "text")
    val store = new TxLogTable(spark,
      Files.createTempDirectory("graft_inc_lsh").toString)
    (0L until 3L).foreach { i =>
      IncrementalLsh.ingest(store, "d",
        docs.filter(pmod(col("doc_id"), lit(3L)) === lit(i)), batchId = i)
    }
    val want = batchCandidates(docs, cap = 100)
    assert(want.nonEmpty, "fixture must produce near-dup candidates")
    assert(candSet(store, "d") === want)
  }

  test("a bucket crossing the cap retracts pairs emitted in earlier batches") {
    val docs = corpus.toDF("doc_id", "text")
    // pick the cap just under the LARGEST final bucket, so exactly the big
    // family bucket overflows — and with the mod-3 batch split a ≥3-member
    // bucket necessarily spans ≥2 batches, exercising the retroactive kill
    val bands = MinHash.bands(MinHash.signatures(docs))
    val maxBucket = bands.groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket >= 3, s"fixture too weak: max bucket size $maxBucket")
    val cap = (maxBucket - 1).toInt
    val store = new TxLogTable(spark,
      Files.createTempDirectory("graft_inc_lsh_cap").toString)
    (0L until 3L).foreach { i =>
      IncrementalLsh.ingest(store, "d",
        docs.filter(pmod(col("doc_id"), lit(3L)) === lit(i)),
        batchId = i, cap = cap)
    }
    val want = batchCandidates(docs, cap = cap)
    val got = candSet(store, "d")
    assert(got === want)
    // and the retraction actually fired: the dead bucket cost us pairs
    assert(want.subsetOf(batchCandidates(docs, cap = 100)) &&
      got.size < batchCandidates(docs, cap = 100).size)
  }

  test("property: ANY batch split yields the one-shot candidate set (seeded random)") {
    // the operator's core claim quantifies over arrival orders, not just
    // the mod-3 fixture: random corpora, random number of batches, random
    // assignment — accumulated incremental must equal one-shot, cap
    // included. Seeded so a failure reproduces.
    val rnd = new scala.util.Random(41)
    (1 to 3).foreach { trial =>
      val base = (s"shared boilerplate sentence repeated across the family " +
        s"of trial $trial documents").trim
      val docs = (1L to 24L).map { i =>
        val text =
          if (i <= 10) s"$base tail$i"
          else s"unique doc ${trial * 1000 + i} " +
            Seq.fill(8)(rnd.nextInt(100000)).mkString(" ")
        (i, text)
      }.toDF("doc_id", "text")
      val nBatches = 2 + rnd.nextInt(3)
      val assign = (1L to 24L).map(i => i -> rnd.nextInt(nBatches)).toMap
      val assignCol = typedLit(assign)
      val store = new TxLogTable(spark,
        Files.createTempDirectory(s"graft_inc_lsh_prop$trial").toString)
      val cap = 1 + rnd.nextInt(8)
      (0 until nBatches).foreach { b =>
        IncrementalLsh.ingest(store, "d",
          docs.filter(assignCol(col("doc_id")) === lit(b)),
          batchId = b.toLong, cap = cap)
      }
      assert(candSet(store, "d") === batchCandidates(docs, cap),
        s"trial $trial: split into $nBatches batches with cap $cap diverged")
    }
  }

  test("optimize: clustered compaction changes layout, never the candidates") {
    val docs = corpus.toDF("doc_id", "text")
    val store = new TxLogTable(spark,
      Files.createTempDirectory("graft_inc_lsh_opt").toString)
    (0L until 3L).foreach { i =>
      IncrementalLsh.ingest(store, "d",
        docs.filter(pmod(col("doc_id"), lit(3L)) === lit(i)), batchId = i)
    }
    val before = candSet(store, "d")
    val filesBefore = store.files("d_bands", store.currentVersion("d_bands").get).size
    IncrementalLsh.optimize(store, "d", targetFiles = 2)
    val filesAfter = store.files("d_bands", store.currentVersion("d_bands").get).size
    assert(filesAfter <= 2 && filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    assert(candSet(store, "d") === before, "optimize must not change candidates")
    // and ingestion continues against the compacted layout
    IncrementalLsh.ingest(store, "d",
      (100L to 102L).map(i =>
          (i, (0 to 7).map(j => i * 100 + j * 19).mkString(" ")))
        .toDF("doc_id", "text"), batchId = 3L)
    assert(candSet(store, "d") === before,
      "fresh unrelated docs must not add candidates")
  }

  test("replaying a batch is a no-op (exactly-once appends)") {
    val docs = corpus.toDF("doc_id", "text")
    val store = new TxLogTable(spark,
      Files.createTempDirectory("graft_inc_lsh_replay").toString)
    (0L until 3L).foreach { i =>
      IncrementalLsh.ingest(store, "d",
        docs.filter(pmod(col("doc_id"), lit(3L)) === lit(i)), batchId = i)
    }
    val before = candSet(store, "d")
    // replay the middle batch — all three appends must skip
    IncrementalLsh.ingest(store, "d",
      docs.filter(pmod(col("doc_id"), lit(3L)) === lit(1L)), batchId = 1L)
    assert(candSet(store, "d") === before)
    assert(store.read("d_pairs").count() ===
      store.read("d_pairs").dropDuplicates("doc_id", "doc_id_2", "band", "bucket").count(),
      "replay must not duplicate pair rows")
  }
}
