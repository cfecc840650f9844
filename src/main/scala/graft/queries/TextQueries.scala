package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-scale training-data operators over the `documents` table: exact and
  * near deduplication, fingerprinting, token statistics, quality scoring,
  * language identification. All are pure Column-expression pipelines
  * (codegen-friendly) with DuckDB oracles.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** n-gram-marker language guess, appended as (lang_guess, marker_hits)
    * — ONE policy shared by `lang_id`, `langid_confusion`, and the
    * streaming scorer's batch parity. Argmax = greatest by (score, code),
    * ties resolved by LAST code; the N-way greatest struct is computed
    * ONCE and both fields projected from it (a separate projection step,
    * so Catalyst cannot inline-duplicate the expression). */
  private def langGuess(d: DataFrame): DataFrame = {
    val markers = Seq(
      "en" -> "\\b(the|and|of|is|was|to)\\b",
      "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
      "es" -> "\\b(el|la|los|que|es|de)\\b",
      "fr" -> "\\b(le|la|les|est|et|une)\\b",
      "zh" -> "[\\u4e00-\\u9fff]")
    val scored = markers.foldLeft(d) { case (acc, (code, pat)) =>
      acc.withColumn(s"score_$code", regexp_count(lower(col("text")), lit(pat)))
    }
    val best = markers.map { case (code, _) =>
      struct(col(s"score_$code").cast("long").as("score"),
        lit(code).as("neg_code"))
    }
    scored.withColumn("__best", greatest(best: _*))
      .withColumn("lang_guess", col("__best").getField("neg_code"))
      .withColumn("marker_hits", col("__best").getField("score").cast("long"))
      .drop("__best" +: markers.map { case (c, _) => s"score_$c" }: _*)
  }

  /** the language-guess chain as DuckDB CTEs ending in `guess`
    * (doc_id, lang, lang_guess, marker_hits) — shared by the `lang_id`
    * and `langid_confusion` oracles. */
  private val langGuessSql: String =
    """lg_scored AS (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(lower(text), '\b(the|and|of|is|was|to)\b')) AS s_en,
      |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS s_de,
      |    len(regexp_extract_all(lower(text), '\b(el|la|los|que|es|de)\b')) AS s_es,
      |    len(regexp_extract_all(lower(text), '\b(le|la|les|est|et|une)\b')) AS s_fr,
      |    len(regexp_extract_all(lower(text), '[一-鿿]')) AS s_zh
      |  FROM documents),
      |lg_ranked AS (
      |  SELECT doc_id, lang, u.lang AS lang_guess,
      |    cast(u.score AS BIGINT) AS marker_hits,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY u.score DESC, u.lang DESC) AS rn
      |  FROM lg_scored, UNNEST([
      |    {'lang': 'en', 'score': s_en}, {'lang': 'de', 'score': s_de},
      |    {'lang': 'es', 'score': s_es}, {'lang': 'fr', 'score': s_fr},
      |    {'lang': 'zh', 'score': s_zh}]) AS t(u)),
      |guess AS (
      |  SELECT doc_id, lang, lang_guess, marker_hits
      |  FROM lg_ranked WHERE rn = 1)""".stripMargin

  /** word-3-gram shingles (shared with the streaming operator) */
  private val shinglesExpr = graft.ops.MinHash.shinglesExpr

  /** same shingles in DuckDB 1.0 (list_transform; range() stop-exclusive) */
  private val shinglesSqlDuck =
    """list_transform(range(1, greatest(len(words) - 1, 1)),
      |      i -> array_to_string(words[i:i+2], ' '))""".stripMargin

  /** MinHash+LSH banded candidate pairs (8 hashes, 2 bands × 4 rows): the
    * shared candidate generator for ALL near-dup verifies. Bucketed — pair
    * generation is an equi-join on (band, bucket), never all-pairs — and
    * capped: buckets holding more than [[MaxBucketSize]] docs are dropped
    * before the self-join (a degenerate bucket of m docs would emit m²/2
    * pairs; at corpus scale that single hot key IS the job's runtime, and
    * its members are near-duplicates of everything, i.e. boilerplate the
    * pipeline should treat separately). */
  private val MaxBucketSize = 100

  /** Candidate pairs are MATERIALIZED once per dataset and shared by every
    * verify query (minhash_lsh / ngram_jaccard / simhash / dedup_clusters):
    * the shingle+signature pass is the dominant cost of the near-dup
    * pipeline, and the production shape stores candidates as a table all
    * verifies join — recomputing it per verify would multiply the dominant
    * cost 4×. Persisted MEMORY_AND_DISK so a too-big candidate set spills
    * instead of recomputing.
    *
    * Keyed by the SESSION OBJECT with EXPLICIT eviction of stopped
    * sessions on every access (a WeakHashMap would never collect here: the
    * cached DataFrames strongly reference their session, pinning the key).
    * Object identity also means a new session can never alias a dead one's
    * cache. */
  private val sessionCaches =
    scala.collection.mutable.Map.empty[SparkSession, scala.collection.mutable.Map[String, DataFrame]]

  private def cachedPerSession(s: SparkSession, key: String)(
      build: => DataFrame): DataFrame = sessionCaches.synchronized {
    sessionCaches.filterInPlace((sess, _) => !sess.sparkContext.isStopped)
    sessionCaches.getOrElseUpdate(s,
      scala.collection.mutable.Map.empty[String, DataFrame])
      .getOrElseUpdate(key, build)
  }

  /** Bench hook: drop this session's shared near-dup artifacts so the
    * canonical builder query's timing includes the COLD build. Median-of-N
    * benching would otherwise hide the pipeline's dominant one-time cost
    * (shingle→signature→bucket chain) from every per-query median — and
    * from their sum. `labelsOnly` drops just the cluster labels, so
    * `dedup_clusters` re-pays the CC rounds while the candidate chain stays
    * warm (the production shape: candidates are a stored table). */
  def evictShared(s: SparkSession, labelsOnly: Boolean = false): Unit =
    sessionCaches.synchronized {
      sessionCaches.get(s).foreach { m =>
        m.keys.filter(k => !labelsOnly || k.startsWith("labels:")).toSeq
          .foreach { k =>
            m.remove(k).foreach(df =>
              try df.unpersist(blocking = false)
              catch { case _: Throwable => () })
          }
      }
    }

  private[queries] def lshCandidates(s: SparkSession, dir: String): DataFrame =
    cachedPerSession(s, s"cands:$dir")(
      buildLshCandidates(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Connected-component labels over the LSH candidate graph
    * ([[graft.ops.GraphOps.connectedComponents]]: min-label propagation
    * with path halving, O(log diameter) rounds, loud on non-convergence).
    * The fixpoint is the component's min doc_id, so the DuckDB
    * transitive-closure oracles verify it unchanged. Memoized like the
    * candidates: clustering and representative-selection both consume the
    * same labels. */
  private def clusterLabels(s: SparkSession, dir: String): DataFrame =
    cachedPerSession(s, s"labels:$dir") {
      graft.ops.GraphOps
        .connectedComponents(lshCandidates(s, dir), "doc_id", "doc_id_2")
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    }

  /** 8-component minhash signature per doc ("m0|m1|…|m7"), optionally
    * restricted to a (small) doc subset BEFORE the shingle explode — the
    * verify-time consumer re-derives signatures for candidate members only,
    * never re-shingling the whole corpus. */
  private def minhashSignatures(s: SparkSession, dir: String,
      restrictTo: Option[DataFrame] = None): DataFrame =
    graft.ops.MinHash.signatures(restrictTo.foldLeft(docs(s, dir))((d, m) =>
      d.join(broadcast(m), Seq("doc_id"), "left_semi")))

  /** (doc_id, band, bucket) rows from a signature frame — 2 bands × 4 rows */
  private def bandsOf(sig: DataFrame): DataFrame =
    graft.ops.MinHash.bands(sig)

  private def buildLshCandidates(s: SparkSession, dir: String): DataFrame = {
    val bands = bandsOf(minhashSignatures(s, dir))
    val capped = bands.join(
      bands.groupBy("band", "bucket").count()
        .filter(col("count") <= MaxBucketSize).drop("count"),
      Seq("band", "bucket"), "left_semi")
    val b2 = capped.select(col("doc_id").as("doc_id_2"), col("band").as("band_2"),
      col("bucket").as("bucket_2"))
    capped.join(b2, col("bucket") === col("bucket_2") && col("band") === col("band_2") &&
        col("doc_id") < col("doc_id_2"))
      .select(col("doc_id"), col("doc_id_2")).distinct()
  }

  /** the same candidate chain as DuckDB CTEs, ending in `cands` */
  private[queries] val lshCandSql =
    s"""w AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS words FROM documents),
       |shl AS (SELECT doc_id, $shinglesSqlDuck AS shs FROM w),
       |sh0 AS (SELECT DISTINCT doc_id, u.shingle FROM shl, UNNEST(shs) AS u(shingle)),
       |sh AS (
       |  SELECT doc_id,
       |    cast(('0x' || substr(md5(shingle), 1, 15)) AS UBIGINT) % 1073741824 AS u
       |  FROM sh0),
       |fam(j, a, b) AS (VALUES (0, 1299721, 11), (1, 2750159, 103),
       |  (2, 4256233, 1009), (3, 5800079, 10007), (4, 7368787, 100003),
       |  (5, 8960453, 1000003), (6, 10570841, 233), (7, 12195257, 377)),
       |mh AS (
       |  SELECT doc_id, j, cast(min((a * u + b) % 1073741789) AS VARCHAR) AS mh
       |  FROM sh, fam GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id, string_agg(mh, '|' ORDER BY j) AS sig FROM mh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, band,
       |    md5(cast(band AS varchar) || '#' ||
       |        array_to_string((regexp_split_to_array(sig, '\\|'))[band*4+1:band*4+4], '|')) AS bucket
       |  FROM sig, UNNEST([0, 1]) AS b(band)),
       |capped AS (
       |  SELECT b.* FROM bands b SEMI JOIN (
       |    SELECT band, bucket FROM bands GROUP BY band, bucket
       |    HAVING count(*) <= 100) s
       |  ON b.band = s.band AND b.bucket = s.bucket),
       |cands AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id, b.doc_id AS doc_id_2
       |  FROM capped a JOIN capped b
       |    ON a.bucket = b.bucket AND a.band = b.band AND a.doc_id < b.doc_id)""".stripMargin
  // ^ MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so an
  // oracle referencing `cands` k times recomputes the whole minhash chain
  // k ways — pagerank_sim and triangle_count (5 references) each burned
  // >70 CPU-minutes at sf1 before this; materialized, the chain runs once.

  /** hashed-feature linear classifier score per doc — shared by
    * `quality_classifier` (thresholded gate) and `classifier_pr_curve`
    * (threshold sweep), so both evaluate ONE model definition. 64 hashed
    * unigram buckets, fixed weights w_b = ((37b+11) mod 21 − 10)/10,
    * sigmoid over the length-normalized dot product; the per-doc sum folds
    * over a bucket-sorted list so Spark and the oracle add in the same
    * order before the 4-dp rounding. */
  private def classifierScored(s: SparkSession, dir: String): DataFrame = {
    val terms = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % 64L).as("bucket"))
    val byBucket = terms.groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    // w_b = ((37b + 11) mod 21 - 10) / 10 ∈ [-1, 1] — exact doubles
    val weight = ((col("bucket") * 37L + 11L) % 21L - 10L).cast("double") / 10.0
    byBucket
      .select(col("doc_id"), col("cnt"),
        struct(col("bucket"),
          (col("cnt").cast("double") * weight).as("c")).as("e"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n"), collect_list(col("e")).as("lst"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.c)") /
            col("n")))), 4).as("score"))
  }

  /** DuckDB mirror of [[classifierScored]]: CTE chain ending in
    * `clf_scored(doc_id, score)` */
  private val classifierScoreSql =
    """clf_terms AS (
      |  SELECT doc_id,
      |    cast(('0x' || substr(md5(u.w), 1, 8)) AS BIGINT) % 64 AS bucket
      |  FROM documents, UNNEST(regexp_split_to_array(text, '\s+')) AS u(w)
      |  WHERE length(u.w) > 0),
      |clf_bb AS (SELECT doc_id, bucket, count(*) AS cnt
      |           FROM clf_terms GROUP BY doc_id, bucket),
      |clf_agg AS (
      |  SELECT doc_id, sum(cnt) AS n,
      |    list(cast(cnt AS double) *
      |         (cast((bucket * 37 + 11) % 21 - 10 AS double) / 10.0)
      |         ORDER BY bucket) AS cs
      |  FROM clf_bb GROUP BY doc_id),
      |clf_scored AS (
      |  SELECT doc_id,
      |    round(1.0 / (1.0 + exp(-(list_sum(cs) / n))), 4) AS score
      |  FROM clf_agg)""".stripMargin

  /** Maximal cross-doc duplicated token spans per document — see the
    * `dup_spans` query comment for semantics and the 100 TB argument.
    * One builder, two consumers (`dup_spans`, `dup_span_ratio`). */
  private def dupSpans(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 5
    val g = docs(s, dir)
      .withColumn("words", split(col("text"), "\\s+"))
      .filter(size(col("words")) >= K)
      // grams travel as 16-byte md5 BINARY — the group key and semi-join
      // key never shuffle raw gram text (or its 32-char hex form)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(words) - ${K - 1}), " +
          s"i -> struct(i AS pos, unhex(md5(concat_ws(' ', slice(words, i, $K)))) AS g))")).as("e"))
      .select(col("doc_id"), col("e.pos").cast("long").as("pos"), col("e.g").as("g"))
    val dupG = g.groupBy("g")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .filter(col("lo") =!= col("hi")).select("g")
    val iv = g.join(dupG, Seq("g"), "left_semi")
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + lit(K - 1)).as("e"))
    val prev = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ord = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, 0)
    iv.withColumn("brk",
        when(col("s") > max(col("e")).over(prev), 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(ord))
      .groupBy("doc_id", "grp")
      .agg(min("s").as("span_start"), max("e").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** DuckDB mirror of [[dupSpans]]: CTE chain ending in
    * `spans(doc_id, span_start, span_end, span_tokens)` */
  private val dupSpanSql =
    """dsw AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
      |  FROM documents),
      |dsg AS (
      |  SELECT doc_id, cast(u.i AS BIGINT) AS pos,
      |    md5(array_to_string(words[cast(u.i AS INT):cast(u.i AS INT)+4], ' ')) AS g
      |  FROM dsw, UNNEST(range(1, cast(len(words) AS BIGINT) - 3)) AS u(i)
      |  WHERE len(words) >= 5),
      |dup_g AS (
      |  SELECT g FROM dsg GROUP BY g HAVING min(doc_id) <> max(doc_id)),
      |ds_iv AS (
      |  SELECT doc_id, pos AS s, pos + 4 AS e
      |  FROM dsg SEMI JOIN dup_g USING (g)),
      |ds_brks AS (
      |  SELECT doc_id, s, e,
      |    CASE WHEN s > max(e) OVER (PARTITION BY doc_id ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    THEN 1 ELSE 0 END AS brk
      |  FROM ds_iv),
      |ds_grps AS (
      |  SELECT doc_id, s, e,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s
      |      ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM ds_brks),
      |spans AS (
      |  SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
      |    max(e) - min(s) + 1 AS span_tokens
      |  FROM ds_grps GROUP BY doc_id, grp)""".stripMargin

  /** DuckDB mirror of [[graft.quality.TextRules.withGopherColumns]] + keep:
    * CTE chain ending in `gopher(doc_id, n_words, mean_word_len,
    * frac_alpha, stopword_hits, symbol_ratio, keep)` — shared by
    * `gopher_rules` and the `source_report` dataset card. */
  private val gopherSql =
    """gw AS (
      |  SELECT doc_id, coalesce(text, '') AS text,
      |    list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
      |                x -> length(x) > 0) AS words
      |  FROM documents),
      |gm AS (
      |  SELECT doc_id,
      |    cast(len(words) AS BIGINT) AS n_words,
      |    round(cast(list_sum(list_transform(words, x -> length(x))) AS double)
      |          / len(words), 4) AS mean_word_len,
      |    round(cast(len(list_filter(words,
      |          x -> regexp_full_match(x, '[A-Za-z]+'))) AS double)
      |          / len(words), 4) AS frac_alpha,
      |    cast(len(list_filter(words,
      |          x -> lower(x) IN ('the','a','and','of','to','in'))) AS BIGINT)
      |      AS stopword_hits,
      |    round(cast(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS double)
      |          / len(words), 4) AS symbol_ratio
      |  FROM gw),
      |gopher AS (
      |  SELECT *,
      |    (n_words BETWEEN 10 AND 100000 AND mean_word_len BETWEEN 2 AND 10
      |     AND frac_alpha >= 0.8 AND stopword_hits >= 2
      |     AND symbol_ratio <= 0.1) AS keep
      |  FROM gm)""".stripMargin

  val all: Seq[Q] = Seq(

    // exact dedup: hash-groupBy, keep lowest doc_id per content hash
    Q("dedup_exact",
      (s, dir) => docs(s, dir)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies")),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
             |       count(*) AS n_copies
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // document fingerprint: hash of whitespace-normalized, lowercased text
    Q("doc_fingerprint",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint")),
      Some("""SELECT doc_id,
             |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
             |FROM documents""".stripMargin)),

    // rolling-hash winnowing fingerprints (the MOSS scheme): hash every
    // char 5-gram of the normalized prefix, then keep the MINIMUM hash of
    // each sliding window of 8 positions — a deterministic, position-robust
    // fingerprint SET per document. Guarantee: any shared substring of
    // length >= 12 (w + k - 1) produces at least one shared fingerprint.
    Q("winnow_fingerprint",
      (s, dir) => {
        val k = 5; val w = 8
        val norm = lower(regexp_replace(col("text"), "\\s+", " "))
        // The whole winnow is per-document over a bounded prefix, so it
        // never needs to leave the row: hash every gram into an array,
        // take the min of each w-slice with array_min, and dedup the
        // fingerprints with array_distinct BEFORE exploding. (doc_id, fp)
        // pairs are unique across docs, so per-array dedup IS global
        // distinct — the query is scan → project → explode with ZERO
        // exchanges. The previous shape exploded 196 grams/doc into a
        // per-doc window (shuffle + sort of ~100M rows at sf10, 265 s);
        // this one is embarrassingly parallel at any SF.
        // The gram-hash array is LET-BOUND as the lambda argument of a
        // single-element transform: `transform(array(<hs>), hs -> ...)[0]`
        // evaluates <hs> once per row. Referencing it as a projected
        // column instead lets Catalyst inline the 196-md5 expression into
        // every lambda reference — re-evaluated per slice element, which
        // measured ~50× slower than the windowed plan it replaces.
        docs(s, dir)
          .select(col("doc_id"), substring(norm, 1, 200).as("t"))
          .filter(length(col("t")) >= k)
          // only full windows exist: positions 1 .. n-(w-1); guard n >= w
          // because sequence(1, 0) would DESCEND, not return empty
          .select(col("doc_id"), explode(expr(
            s"""transform(array(transform(sequence(1, length(t) - ${k - 1}), i -> md5(substr(t, i, $k)))),
               |  hs -> IF(size(hs) >= $w,
               |           array_distinct(transform(sequence(1, size(hs) - ${w - 1}), j -> array_min(slice(hs, j, $w)))),
               |           cast(array() AS array<string>)))[0]""".stripMargin)).as("fp"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, substr(lower(regexp_replace(text, '\s+', ' ', 'g')), 1, 200) AS t
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id, u.i, md5(substr(t, cast(u.i AS INT), 5)) AS h
             |  FROM t, UNNEST(range(1, cast(length(t) AS BIGINT) - 3)) AS u(i)
             |  WHERE length(t) >= 5),
             |winnowed AS (
             |  SELECT doc_id, i,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
             |    count(*) OVER (PARTITION BY doc_id) AS n
             |  FROM grams)
             |SELECT DISTINCT doc_id, fp FROM winnowed WHERE i <= n - 7""".stripMargin)),

    // exact SUBSTRING-level dedup (the "Deduplicating Training Data Makes
    // Language Models Better" ExactSubstr shape, token-granular): every
    // word-5-gram position is hashed, grams appearing in >= 2 DISTINCT
    // docs are flagged (min(doc)<>max(doc) per gram — no count-distinct
    // expansion), and flagged positions merge into MAXIMAL duplicated
    // spans per doc by interval merge (break when a span starts past
    // every previous end; windows partition by doc_id, never global).
    // 100 TB shape: grams shuffle as 32-hex hashes, the dup-gram test is
    // one map-side-combinable agg, the flag-back is an equi-join on the
    // uniformly-distributed hash (no salting needed), and span assembly
    // is per-doc. Output spans are what a scrubber would cut or the
    // dup-ratio gate below meters. Distinct from `dup_span_removal` /
    // `dup_span_rewrite` (directional: a position is dup iff its gram
    // FIRST appeared in a lower doc_id — who keeps the text): here
    // duplication is SYMMETRIC (any gram shared across docs marks both
    // sides) and the deliverable is the merged [start, end] boundaries,
    // not per-position counts.
    Q("dup_spans",
      (s, dir) => dupSpans(s, dir),
      Some(s"""WITH $dupSpanSql
             |SELECT doc_id, span_start, span_end, span_tokens
             |FROM spans""".stripMargin)),

    // the METER over the spans: per-doc duplicated-token fraction and the
    // keep/drop gate a pipeline applies before training (docs that are
    // mostly duplicated text are boilerplate; docs under 5 tokens carry no
    // gram and keep ratio 0 via the left join). Same span definition as
    // dup_spans — one builder, two consumers.
    Q("dup_span_ratio",
      (s, dir) => {
        val perDoc = dupSpans(s, dir).groupBy("doc_id")
          .agg(sum("span_tokens").as("dup_tokens"))
        docs(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("ws_tokens"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
              col("ws_tokens"), 6).as("dup_ratio"))
          .withColumn("keep", col("dup_ratio") < 0.5)
      },
      Some(s"""WITH $dupSpanSql,
             |per_doc AS (
             |  SELECT doc_id, sum(span_tokens) AS dup_tokens
             |  FROM spans GROUP BY doc_id)
             |SELECT d.doc_id,
             |  cast(len(regexp_split_to_array(d.text, '\\s+')) AS BIGINT) AS ws_tokens,
             |  -- DuckDB sum(BIGINT) widens to HUGEINT (→ float64 in the
             |  -- dump); Spark emits int64 — cast back or the hash differs
             |  cast(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
             |  round(cast(coalesce(p.dup_tokens, 0) AS double) /
             |    len(regexp_split_to_array(d.text, '\\s+')), 6) AS dup_ratio,
             |  round(cast(coalesce(p.dup_tokens, 0) AS double) /
             |    len(regexp_split_to_array(d.text, '\\s+')), 6) < 0.5 AS keep
             |FROM documents d LEFT JOIN per_doc p USING (doc_id)""".stripMargin)),

    // the DATASET CARD: one per-source row a corpus release ships —
    // volume (docs, tokens), the Gopher keep-rate (same rule definition
    // the gate and the streaming router apply, via quality.TextRules),
    // the duplicated-token ratio (same span definition as dup_spans), and
    // the dominant language. Three shared builders, one report — the
    // composite is joins over per-doc frames followed by a #sources-row
    // aggregate, so its scale cost IS its components' cost; nothing here
    // re-derives what a component already computed differently.
    Q("source_report",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir)
        val base = d.select(col("doc_id"), col("source"), col("lang"),
          size(split(col("text"), "\\s+")).cast("long").as("toks"))
        val keep = graft.quality.TextRules.withGopherColumns(d, "text")
          .select(col("doc_id"), col("keep"))
        val dupTok = dupSpans(s, dir).groupBy("doc_id")
          .agg(sum("span_tokens").as("dup_tokens"))
        val rep = base.join(keep, Seq("doc_id"))
          .join(dupTok, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("n_tokens"),
            round(avg(when(col("keep"), 1.0).otherwise(0.0)), 6).as("keep_rate"),
            round(sum(coalesce(col("dup_tokens"), lit(0L))).cast("double") /
              sum(col("toks")), 6).as("dup_token_ratio"))
        val topLang = base.groupBy("source", "lang")
          .agg(count(lit(1)).as("nl"))
          .withColumn("rn", row_number().over(Window.partitionBy("source")
            .orderBy(col("nl").desc, col("lang").asc)))
          .filter(col("rn") === 1)
          .select(col("source"), col("lang").as("top_lang"))
        rep.join(topLang, Seq("source"))
      },
      Some(s"""WITH $gopherSql,
             |$dupSpanSql,
             |per_doc_dup AS (
             |  SELECT doc_id, sum(span_tokens) AS dup_tokens
             |  FROM spans GROUP BY doc_id),
             |base AS (
             |  SELECT doc_id, source, lang,
             |    cast(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS toks
             |  FROM documents),
             |rep AS (
             |  SELECT b.source, count(*) AS n_docs,
             |    cast(sum(b.toks) AS BIGINT) AS n_tokens,
             |    round(avg(CASE WHEN g.keep THEN 1.0 ELSE 0.0 END), 6) AS keep_rate,
             |    round(sum(coalesce(p.dup_tokens, 0)) / cast(sum(b.toks) AS double), 6)
             |      AS dup_token_ratio
             |  FROM base b JOIN gopher g USING (doc_id)
             |  LEFT JOIN per_doc_dup p USING (doc_id)
             |  GROUP BY b.source),
             |lang_rank AS (
             |  SELECT source, lang, count(*) AS nl,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY count(*) DESC, lang ASC) AS rn
             |  FROM base GROUP BY source, lang)
             |SELECT r.source, r.n_docs, r.n_tokens, r.keep_rate,
             |  r.dup_token_ratio, lr.lang AS top_lang
             |FROM rep r JOIN lang_rank lr ON lr.source = r.source AND lr.rn = 1""".stripMargin)),

    // token counting: whitespace tokens + BPE-ish word/punct pieces + chars
    Q("token_stats",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("bpe_ish_tokens"),
        length(col("text")).cast("long").as("n_chars_measured")),
      Some("""SELECT doc_id,
             |  cast(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS ws_tokens,
             |  cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
             |  cast(length(text) AS BIGINT) AS n_chars_measured
             |FROM documents""".stripMargin)),

    // quality scoring: structural ratios + keep/drop flag
    Q("quality_score",
      (s, dir) => {
        val words = size(split(col("text"), "\\s+"))
        val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]"))
        val stop = regexp_count(lower(col("text")),
          lit("\\b(the|a|of|and|to|in|is|it|that|for)\\b"))
        docs(s, dir).select(
          col("doc_id"),
          words.cast("long").as("n_words"),
          punct.cast("long").as("n_punct"),
          stop.cast("long").as("n_stopwords"),
          (length(col("text")).cast("double") / words).as("mean_word_len"),
          (words >= 5 && punct * 4 < length(col("text"))).as("keep"))
      },
      Some("""SELECT doc_id,
             |  cast(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_words,
             |  cast(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
             |  cast(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS BIGINT) AS n_stopwords,
             |  cast(length(text) AS double) / len(regexp_split_to_array(text, '\s+')) AS mean_word_len,
             |  (len(regexp_split_to_array(text, '\s+')) >= 5
             |   AND len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 4 < length(text)) AS keep
             |FROM documents""".stripMargin)),

    // log2-bucketed LENGTH HISTOGRAM per source: the corpus-shape
    // diagnostic a mixture designer reads before setting chunk sizes.
    // Pure groupBy over derived int keys — one shuffle of #(source ×
    // ~30 buckets) partial aggregates regardless of corpus size. floor ∘
    // log2 only straddles a bucket boundary at exact powers of two,
    // where log2 is exactly representable in both engines.
    Q("doc_length_histogram",
      (s, dir) => docs(s, dir)
        .filter(col("n_chars") > 0)
        .withColumn("bucket", floor(log2(col("n_chars"))).cast("long"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars")),
      Some("""SELECT source,
             |  cast(floor(log2(n_chars)) AS BIGINT) AS bucket,
             |  cast(count(*) AS BIGINT) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents WHERE n_chars > 0
             |GROUP BY source, bucket""".stripMargin)),

    // TOKENIZER FERTILITY per language: chars-per-token and
    // tokens-per-doc under the BPE-ish token regex (same definition as
    // token_stats — one tokenizer policy across the registry). The
    // ratios are computed from EXACT integer sums, so the output is
    // order-independent; one stateless projection + one tiny groupBy.
    // Fertility differences per language are what decide per-language
    // token budgets in a mixture.
    Q("tokenizer_fertility",
      (s, dir) => {
        val d = docs(s, dir).select(col("lang"),
          length(col("text")).cast("long").as("nc"),
          regexp_count(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("bpe"))
        d.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nc")).as("n_chars"),
            sum(col("bpe")).as("n_tokens"))
          .select(col("lang"), col("n_docs"), col("n_chars"), col("n_tokens"),
            round(col("n_chars").cast("double") / col("n_tokens"), 4)
              .as("chars_per_token"),
            round(col("n_tokens").cast("double") / col("n_docs"), 4)
              .as("tokens_per_doc"))
      },
      Some("""WITH d AS (
             |  SELECT lang, length(text) AS nc,
             |    len(regexp_extract_all(text,
             |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe
             |  FROM documents)
             |SELECT lang, cast(count(*) AS BIGINT) AS n_docs,
             |  cast(sum(nc) AS BIGINT) AS n_chars,
             |  cast(sum(bpe) AS BIGINT) AS n_tokens,
             |  round(cast(sum(nc) AS double) / sum(bpe), 4) AS chars_per_token,
             |  round(cast(sum(bpe) AS double) / count(*), 4) AS tokens_per_doc
             |FROM d GROUP BY lang""".stripMargin)),

    // QUALITY DECILES per source: ntile(10) over a deterministic scalar
    // score (mean word length, rounded to pin engine parity; doc_id
    // tiebreak so equal scores rank identically). The decile boundary
    // table is what calibrates a quality-threshold sweep before
    // committing to a keep-rate. The window partitions by source —
    // bounded per-partition sort, never a global one.
    Q("quality_deciles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val words = size(split(col("text"), "\\s+"))
        val d = docs(s, dir).select(col("doc_id"), col("source"),
          round(length(col("text")).cast("double") / words, 6).as("score"))
        val w = Window.partitionBy("source").orderBy("score", "doc_id")
        d.withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy("source", "decile")
          .agg(count(lit(1)).as("n_docs"),
            round(min(col("score")), 6).as("min_score"),
            round(max(col("score")), 6).as("max_score"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    round(cast(length(text) AS double)
             |      / len(regexp_split_to_array(text, '\s+')), 6) AS score
             |  FROM documents),
             |t AS (
             |  SELECT source, score, ntile(10) OVER (
             |    PARTITION BY source ORDER BY score, doc_id) AS decile
             |  FROM d)
             |SELECT source, cast(decile AS BIGINT) AS decile,
             |  cast(count(*) AS BIGINT) AS n_docs,
             |  round(min(score), 6) AS min_score,
             |  round(max(score), 6) AS max_score
             |FROM t GROUP BY source, decile""".stripMargin)),

    // language ID: n-gram/stopword heuristic — argmax over per-language
    // marker counts (deterministic tiebreak by language code)
    Q("lang_id",
      (s, dir) => langGuess(docs(s, dir))
        .select(col("doc_id"), col("lang_guess"), col("marker_hits")),
      Some(s"""WITH $langGuessSql
              |SELECT doc_id, lang_guess, marker_hits FROM guess""".stripMargin)),

    // LANGUAGE-ID CONFUSION MATRIX + per-truth recall: the acceptance
    // eval for the marker classifier against the corpus's ground-truth
    // lang column — the same contract as ann_recall/pq_recall: every
    // heuristic ships with the eval that decides whether to trust it.
    // One scan through the shared langGuess policy, one bounded groupBy
    // (langs × langs), truth totals ride back on a broadcast.
    Q("langid_confusion",
      (s, dir) => {
        val g = langGuess(docs(s, dir))
          .select(col("lang").as("lang_true"), col("lang_guess"))
        val cells = g.groupBy(col("lang_true"), col("lang_guess"))
          .agg(count(lit(1)).as("n"))
        val totals = cells.groupBy(col("lang_true"))
          .agg(sum(col("n")).as("n_true"))
        cells.join(broadcast(totals), Seq("lang_true"))
          .select(col("lang_true"), col("lang_guess"), col("n"), col("n_true"),
            round(col("n").cast("double") / col("n_true"), 6).as("frac"),
            (col("lang_true") === col("lang_guess")).as("correct"))
      },
      Some(s"""WITH $langGuessSql,
              |cells AS (
              |  SELECT lang AS lang_true, lang_guess,
              |    cast(count(*) AS BIGINT) AS n
              |  FROM guess GROUP BY 1, 2),
              |totals AS (
              |  SELECT lang_true, cast(sum(n) AS BIGINT) AS n_true
              |  FROM cells GROUP BY 1)
              |SELECT c.lang_true, c.lang_guess, c.n, t.n_true,
              |  round(cast(c.n AS double) / t.n_true, 6) AS frac,
              |  c.lang_true = c.lang_guess AS correct
              |FROM cells c JOIN totals t USING (lang_true)""".stripMargin)),

    // BINARY → VECTOR → RETRIEVAL plumbing: "embed" each document blob
    // into 8 fixed-width dims derived from the md5 of its BYTES (the
    // deterministic stand-in for a real encoder — the container has no
    // model libs; the Spark path being exercised is the real one: binary
    // column → fixed-width vector → broadcast-probe cosine top-k). The
    // probe is doc 0's vector, attached by broadcast; one corpus scan.
    Q("blob_embed_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
          .withColumn("v", expr(
            """transform(sequence(0, 7), i ->
              |  cast(conv(substring(md5(blob), i * 4 + 1, 4), 16, 10) AS double)
              |    / 65535.0)""".stripMargin))
        val probe = d.filter(col("doc_id") === 0)
          .select(col("v").as("pv"))
        val scored = d.filter(col("doc_id") =!= 0).crossJoin(broadcast(probe))
          .select(col("doc_id"), round(
            expr("""aggregate(zip_with(v, pv, (a, b) -> a * b), 0.0D,
                   |  (acc, x) -> acc + x)""".stripMargin) /
              (sqrt(expr("aggregate(v, 0.0D, (acc, x) -> acc + x * x)")) *
                sqrt(expr("aggregate(pv, 0.0D, (acc, x) -> acc + x * x)"))), 4)
            .as("cos_sim"))
        val w = Window.orderBy(col("cos_sim").desc, col("doc_id").asc)
        scored.orderBy(col("cos_sim").desc, col("doc_id").asc).limit(10)
          .withColumn("rank", row_number().over(w).cast("long"))
      },
      Some("""WITH v AS (
             |  SELECT doc_id,
             |    list_transform(range(0, 8), i ->
             |      cast(('0x' || substr(md5(text), cast(i * 4 + 1 AS int), 4))
             |        AS BIGINT) / 65535.0) AS v
             |  FROM documents),
             |probe AS (SELECT v AS pv FROM v WHERE doc_id = 0),
             |scored AS (
             |  SELECT v.doc_id,
             |    round(list_sum(list_transform(list_zip(v.v, probe.pv),
             |        z -> z[1] * z[2]))
             |      / (sqrt(list_sum(list_transform(v.v, x -> x * x)))
             |        * sqrt(list_sum(list_transform(probe.pv, x -> x * x)))), 4)
             |      AS cos_sim
             |  FROM v, probe WHERE v.doc_id <> 0)
             |SELECT doc_id, cos_sim,
             |  cast(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC)
             |    AS BIGINT) AS rank
             |FROM scored
             |ORDER BY cos_sim DESC, doc_id ASC LIMIT 10""".stripMargin)),

    // LEXICAL DIVERSITY per document: type-token ratio, hapax fraction
    // (words used once IN the doc), and rare-word ratio vs the CORPUS
    // document frequency (df ≤ 2) — the novelty/fluency signals that
    // separate generated boilerplate (low TTR) from natural prose and
    // OOV-heavy noise (high rare ratio). Per-row array ops for the
    // within-doc signals; one explode + df join for the corpus one.
    Q("lexical_diversity",
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"),
          expr("""filter(split(lower(text), '\\s+'),
                 |  w -> w rlike '^[a-z]+$')""".stripMargin).as("ws"))
        val inDoc = d.select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(array_distinct(col("ws"))).cast("long").as("n_types"),
          expr("""size(filter(array_distinct(ws),
                 |  w -> size(filter(ws, x -> x = w)) = 1))""".stripMargin)
            .cast("long").as("n_hapax"))
        val df = d.select(col("doc_id"), explode(array_distinct(col("ws"))).as("w"))
          .groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
        val rare = d.select(col("doc_id"), explode(array_distinct(col("ws"))).as("w"))
          .join(df, Seq("w"))
          .groupBy("doc_id")
          .agg(sum(when(col("df") <= 2, 1L).otherwise(0L)).as("n_rare"))
        inDoc.join(rare, Seq("doc_id"))
          .select(col("doc_id"), col("n_words"), col("n_types"),
            round(col("n_types").cast("double") / col("n_words"), 6).as("ttr"),
            round(col("n_hapax").cast("double") / col("n_types"), 6)
              .as("hapax_frac"),
            round(col("n_rare").cast("double") / col("n_types"), 6)
              .as("rare_frac"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'),
             |      w -> regexp_matches(w, '^[a-z]+$')) AS ws
             |  FROM documents),
             |indoc AS (
             |  SELECT doc_id, cast(len(ws) AS BIGINT) AS n_words,
             |    cast(len(list_distinct(ws)) AS BIGINT) AS n_types,
             |    cast(len(list_filter(list_distinct(ws),
             |      w -> len(list_filter(ws, x -> x = w)) = 1)) AS BIGINT)
             |      AS n_hapax
             |  FROM d),
             |words AS (
             |  SELECT DISTINCT doc_id, unnest(list_distinct(ws)) AS w FROM d),
             |dfreq AS (
             |  SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
             |rare AS (
             |  SELECT doc_id,
             |    cast(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_rare
             |  FROM words JOIN dfreq USING (w) GROUP BY 1)
             |SELECT i.doc_id, i.n_words, i.n_types,
             |  round(cast(i.n_types AS double) / i.n_words, 6) AS ttr,
             |  round(cast(i.n_hapax AS double) / i.n_types, 6) AS hapax_frac,
             |  round(cast(r.n_rare AS double) / i.n_types, 6) AS rare_frac
             |FROM indoc i JOIN rare r USING (doc_id)""".stripMargin)),

    // PMI COLLOCATIONS: top-20 adjacent word bigrams by pointwise mutual
    // information (min count 5) — the collocation extractor that finds
    // multi-word units ("new york") worth treating as single tokens.
    // Bigram counts explode per row (bounded by token count, map-side),
    // unigram marginals join back WITHOUT a forced broadcast (vocabulary
    // is unbounded at corpus scale), PMI from exact counts, top-k via
    // TakeOrderedAndProject.
    Q("word_pmi_topk",
      (s, dir) => {
        val toks = docs(s, dir).select(
          expr("""filter(split(lower(text), '\\s+'),
                 |  w -> w rlike '^[a-z]+$')""".stripMargin).as("ws"))
        val uni = toks.select(explode(col("ws")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("uf"))
        val tot = uni.agg(sum(col("uf")).as("n_tokens"))
        val big = toks.select(explode(expr(
            """CASE WHEN size(ws) < 2 THEN array()
              |ELSE transform(sequence(1, size(ws) - 1),
              |  i -> struct(element_at(ws, i) AS w1,
              |              element_at(ws, i + 1) AS w2)) END""".stripMargin))
            .as("b"))
          .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .agg(count(lit(1)).as("bf"))
          .filter(col("bf") >= 5)
        big
          .join(uni.select(col("w").as("w1"), col("uf").as("f1")), Seq("w1"))
          .join(uni.select(col("w").as("w2"), col("uf").as("f2")), Seq("w2"))
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"), col("bf"), col("f1"), col("f2"),
            round(log(col("bf").cast("double") * col("n_tokens") /
              (col("f1") * col("f2"))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
             |    w -> regexp_matches(w, '^[a-z]+$')) AS ws
             |  FROM documents),
             |uni AS (
             |  SELECT unnest(ws) AS w FROM toks),
             |uf AS (SELECT w, cast(count(*) AS BIGINT) AS uf FROM uni GROUP BY 1),
             |tot AS (SELECT cast(sum(uf) AS BIGINT) AS n_tokens FROM uf),
             |bl AS (
             |  SELECT unnest(CASE WHEN len(ws) < 2 THEN []
             |    ELSE list_transform(range(1, len(ws)),
             |      i -> {'w1': ws[cast(i AS int)], 'w2': ws[cast(i AS int) + 1]})
             |    END) AS b
             |  FROM toks),
             |bf AS (
             |  SELECT b.w1 AS w1, b.w2 AS w2, cast(count(*) AS BIGINT) AS bf
             |  FROM bl GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT b.w1, b.w2, b.bf, a1.uf AS f1, a2.uf AS f2,
             |  round(ln(cast(b.bf AS double) * t.n_tokens
             |    / (a1.uf * cast(a2.uf AS double))), 6) AS pmi
             |FROM bf b JOIN uf a1 ON a1.w = b.w1 JOIN uf a2 ON a2.w = b.w2, tot t
             |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin)),

    // QUALITY-METRIC CORRELATIONS: Pearson r between document length,
    // mean word length, and stopword ratio — the collinearity check run
    // before stacking quality filters (two rules at r ≈ 1 are one rule
    // double-counted). Exact integer/rounded sums in ONE aggregate pass;
    // r assembled from the moments, no per-pair rescans.
    Q("quality_correlations",
      (s, dir) => {
        val words = size(split(col("text"), "\\s+"))
        val d = docs(s, dir).select(
          words.cast("double").as("x"),
          round(length(col("text")).cast("double") / words, 6).as("y"),
          round(regexp_count(lower(col("text")),
            lit("\\b(the|a|of|and|to|in|is|it|that|for)\\b")).cast("double") /
            words, 6).as("z"))
        val m = d.agg(count(lit(1)).as("n"),
          round(sum(col("x")), 4).as("sx"), round(sum(col("y")), 4).as("sy"),
          round(sum(col("z")), 4).as("sz"),
          round(sum(col("x") * col("x")), 4).as("sxx"),
          round(sum(col("y") * col("y")), 4).as("syy"),
          round(sum(col("z") * col("z")), 4).as("szz"),
          round(sum(col("x") * col("y")), 4).as("sxy"),
          round(sum(col("x") * col("z")), 4).as("sxz"),
          round(sum(col("y") * col("z")), 4).as("syz"))
        def r(sab: Column, sa: Column, sb: Column,
              saa: Column, sbb: Column): Column =
          round((col("n") * sab - sa * sb) /
            (sqrt(col("n") * saa - sa * sa) * sqrt(col("n") * sbb - sb * sb)), 6)
        m.select(col("n"),
          r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
            .as("r_len_wordlen"),
          r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
            .as("r_len_stopword"),
          r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
            .as("r_wordlen_stopword"))
      },
      Some("""WITH d AS (
             |  SELECT cast(len(regexp_split_to_array(text, '\s+')) AS double) AS x,
             |    round(cast(length(text) AS double)
             |      / len(regexp_split_to_array(text, '\s+')), 6) AS y,
             |    round(cast(len(regexp_extract_all(lower(text),
             |      '\b(the|a|of|and|to|in|is|it|that|for)\b'))
             |      AS double) / len(regexp_split_to_array(text, '\s+')), 6) AS z
             |  FROM documents),
             |m AS (
             |  SELECT cast(count(*) AS BIGINT) AS n,
             |    round(sum(x), 4) AS sx, round(sum(y), 4) AS sy,
             |    round(sum(z), 4) AS sz,
             |    round(sum(x * x), 4) AS sxx, round(sum(y * y), 4) AS syy,
             |    round(sum(z * z), 4) AS szz,
             |    round(sum(x * y), 4) AS sxy, round(sum(x * z), 4) AS sxz,
             |    round(sum(y * z), 4) AS syz
             |  FROM d)
             |SELECT n,
             |  round((n * sxy - sx * sy)
             |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             |    AS r_len_wordlen,
             |  round((n * sxz - sx * sz)
             |    / (sqrt(n * sxx - sx * sx) * sqrt(n * szz - sz * sz)), 6)
             |    AS r_len_stopword,
             |  round((n * syz - sy * sz)
             |    / (sqrt(n * syy - sy * sy) * sqrt(n * szz - sz * sz)), 6)
             |    AS r_wordlen_stopword
             |FROM m""".stripMargin)),

    // STRATIFIED K-FOLD assignment: fold = md5(doc) mod 5 WITHIN each
    // language stratum, so every fold carries every language at its
    // corpus share — the CV-split layout that keeps per-fold eval
    // distributions honest. Emits the (lang × fold) census with each
    // stratum's per-fold share so balance is oracle-checked, not
    // assumed. Stateless projection + one bounded groupBy.
    Q("stratified_kfold",
      (s, dir) => {
        val d = docs(s, dir).select(col("lang"),
          (conv(substring(md5(concat(lit("kf#"), col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("long") % 5L).as("fold"))
        val cells = d.groupBy(col("lang"), col("fold"))
          .agg(count(lit(1)).as("n_docs"))
        val strata = cells.groupBy("lang").agg(sum(col("n_docs")).as("n_lang"))
        cells.join(broadcast(strata), Seq("lang"))
          .select(col("lang"), col("fold"), col("n_docs"), col("n_lang"),
            round(col("n_docs").cast("double") / col("n_lang"), 6)
              .as("fold_share"))
      },
      Some("""WITH d AS (
             |  SELECT lang,
             |    cast(('0x' || substr(md5('kf#' || cast(doc_id AS VARCHAR)), 1, 8))
             |      AS BIGINT) % 5 AS fold
             |  FROM documents),
             |cells AS (
             |  SELECT lang, fold, cast(count(*) AS BIGINT) AS n_docs
             |  FROM d GROUP BY 1, 2),
             |strata AS (
             |  SELECT lang, cast(sum(n_docs) AS BIGINT) AS n_lang
             |  FROM cells GROUP BY 1)
             |SELECT c.lang, c.fold, c.n_docs, s.n_lang,
             |  round(cast(c.n_docs AS double) / s.n_lang, 6) AS fold_share
             |FROM cells c JOIN strata s USING (lang)""".stripMargin)),

    // CALIBRATION RELIABILITY BINS for the quality classifier: decile
    // bins of predicted score vs the empirical positive rate (Gopher
    // labels) — the diagram that says whether 0.8 MEANS 80% before the
    // score gates a corpus (the PR curve picks a threshold; calibration
    // decides if the scores are probabilities). One scan for scores, one
    // for labels, one bounded 10-row groupBy; bin means divide exact
    // rounded sums.
    Q("calibration_bins",
      (s, dir) => {
        val scored = classifierScored(s, dir)
        val labels = graft.quality.TextRules
          .withGopherColumns(docs(s, dir), "text")
          .select(col("doc_id"), col("keep").as("label"))
        scored.join(labels, Seq("doc_id"))
          .withColumn("bin", least(floor(col("score") * 10), lit(9.0)).cast("long"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            round(round(sum(col("score")), 4) / count(lit(1)), 6).as("mean_score"),
            round(sum(when(col("label"), 1L).otherwise(0L)).cast("double") /
              count(lit(1)), 6).as("frac_positive"))
      },
      Some(s"""WITH $classifierScoreSql,
             |gw AS (
             |  SELECT doc_id, coalesce(text, '') AS text,
             |    list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
             |                x -> length(x) > 0) AS words
             |  FROM documents),
             |gm AS (
             |  SELECT doc_id,
             |    cast(len(words) AS BIGINT) AS n_words,
             |    round(cast(list_sum(list_transform(words, x -> length(x))) AS double)
             |          / len(words), 4) AS mean_word_len,
             |    round(cast(len(list_filter(words,
             |          x -> regexp_full_match(x, '[A-Za-z]+'))) AS double)
             |          / len(words), 4) AS frac_alpha,
             |    cast(len(list_filter(words,
             |          x -> lower(x) IN ('the','a','and','of','to','in'))) AS BIGINT)
             |      AS stopword_hits,
             |    round(cast(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS double)
             |          / len(words), 4) AS symbol_ratio
             |  FROM gw),
             |lab AS (
             |  SELECT doc_id,
             |    coalesce(n_words BETWEEN 10 AND 100000
             |      AND mean_word_len BETWEEN 2 AND 10 AND frac_alpha >= 0.8
             |      AND stopword_hits >= 2 AND symbol_ratio <= 0.1, false) AS label
             |  FROM gm)
             |SELECT cast(least(floor(score * 10), 9.0) AS BIGINT) AS bin,
             |  cast(count(*) AS BIGINT) AS n,
             |  round(round(sum(score), 4) / count(*), 6) AS mean_score,
             |  round(cast(sum(CASE WHEN label THEN 1 ELSE 0 END) AS double)
             |    / count(*), 6) AS frac_positive
             |FROM clf_scored JOIN lab USING (doc_id)
             |GROUP BY 1""".stripMargin)),

    // CORPUS DIVERSITY: Shannon entropy of the source mix (in tokens,
    // not docs — what the model actually sees) and the EFFECTIVE source
    // count exp(H) — the one-number diversity summary a mixture report
    // leads with. Exact integer token sums → bounded per-source table →
    // one scalar aggregate.
    Q("corpus_diversity",
      (s, dir) => {
        val d = docs(s, dir).select(col("source"),
          regexp_count(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("toks"))
        val bySrc = d.groupBy("source").agg(sum(col("toks")).as("n_toks"))
        val tot = bySrc.agg(sum(col("n_toks")).as("n"))
        val p = col("n_toks").cast("double") / col("n")
        bySrc.crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("n_sources"),
            round(sum(-p * log(p)), 6).as("entropy"))
          .withColumn("effective_sources", round(exp(col("entropy")), 4))
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    len(regexp_extract_all(text,
             |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS toks
             |  FROM documents),
             |s AS (
             |  SELECT source, cast(sum(toks) AS BIGINT) AS n_toks
             |  FROM d GROUP BY 1),
             |t AS (SELECT cast(sum(n_toks) AS BIGINT) AS n FROM s)
             |SELECT cast(count(*) AS BIGINT) AS n_sources,
             |  round(sum(-(cast(n_toks AS double) / n)
             |    * ln(cast(n_toks AS double) / n)), 6) AS entropy,
             |  round(exp(round(sum(-(cast(n_toks AS double) / n)
             |    * ln(cast(n_toks AS double) / n)), 6)), 4) AS effective_sources
             |FROM s, t""".stripMargin)),

    // ZIPF RANK-FREQUENCY SLOPE: least-squares fit of log(freq) vs
    // log(rank) over the top-100 words — natural corpora sit near −1;
    // a flat slope flags templated/synthetic text, a cliff flags
    // boilerplate. The rank is computed WINDOWLESS on the bounded
    // top-100 (count of strictly-ahead rows via one broadcast triangular
    // join), so no partition-less window exists; the regression reduces
    // exact rounded logs.
    Q("zipf_slope",
      (s, dir) => {
        val words = docs(s, dir)
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(col("w").rlike("^[a-z]+$"))
          .groupBy("w").agg(count(lit(1)).as("f"))
        val top = words.orderBy(col("f").desc, col("w").asc).limit(100)
        val t2 = top.select(col("w").as("w2"), col("f").as("f2"))
        val ranked = top.join(broadcast(t2),
            col("f2") > col("f") ||
              (col("f2") === col("f") && col("w2") < col("w")), "left")
          .groupBy(col("w"), col("f"))
          .agg((count(col("w2")) + 1L).as("rank"))
        val pts = ranked.select(
          round(log(col("rank").cast("double")), 6).as("lx"),
          round(log(col("f").cast("double")), 6).as("ly"))
        pts.agg(count(lit(1)).as("n_points"),
            round(sum(col("lx")), 6).as("sx"), round(sum(col("ly")), 6).as("sy"),
            round(sum(col("lx") * col("lx")), 6).as("sxx"),
            round(sum(col("lx") * col("ly")), 6).as("sxy"))
          .select(col("n_points"),
            round((col("n_points") * col("sxy") - col("sx") * col("sy")) /
              (col("n_points") * col("sxx") - col("sx") * col("sx")), 6)
              .as("zipf_slope"),
            round((col("sy") - ((col("n_points") * col("sxy") -
              col("sx") * col("sy")) /
              (col("n_points") * col("sxx") - col("sx") * col("sx"))) *
              col("sx")) / col("n_points"), 6).as("intercept"))
      },
      Some("""WITH w AS (
             |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
             |  FROM documents),
             |f AS (
             |  SELECT w, cast(count(*) AS BIGINT) AS f FROM w
             |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
             |top AS (
             |  SELECT w, f, cast(ROW_NUMBER() OVER (ORDER BY f DESC, w ASC)
             |    AS BIGINT) AS rank
             |  FROM f ORDER BY f DESC, w ASC LIMIT 100),
             |pts AS (
             |  SELECT round(ln(cast(rank AS double)), 6) AS lx,
             |    round(ln(cast(f AS double)), 6) AS ly
             |  FROM top),
             |m AS (
             |  SELECT cast(count(*) AS BIGINT) AS n, round(sum(lx), 6) AS sx,
             |    round(sum(ly), 6) AS sy, round(sum(lx * lx), 6) AS sxx,
             |    round(sum(lx * ly), 6) AS sxy
             |  FROM pts)
             |SELECT n AS n_points,
             |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
             |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             |    AS intercept
             |FROM m""".stripMargin)),

    // DEDUP-GRAPH DEGREE DIAGNOSTICS: per-document candidate degree →
    // log2 degree histogram — the hot-bucket early-warning for the LSH
    // graph (a heavy-tailed degree distribution means the bucket cap is
    // about to bite and CC components will chain). Symmetrized count per
    // endpoint, one bounded histogram groupBy.
    Q("dup_graph_degrees",
      (s, dir) => {
        val c = lshCandidates(s, dir)
        val deg = c.select(col("doc_id"))
          .unionByName(c.select(col("doc_id_2").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        deg.groupBy(floor(log2(col("degree"))).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("degree")).as("min_degree"),
            max(col("degree")).as("max_degree"))
      },
      Some(s"""WITH $lshCandSql,
              |deg AS (
              |  SELECT doc_id, cast(count(*) AS BIGINT) AS degree FROM (
              |    SELECT doc_id FROM cands
              |    UNION ALL SELECT doc_id_2 FROM cands)
              |  GROUP BY doc_id)
              |SELECT cast(floor(log2(degree)) AS BIGINT) AS bucket,
              |  cast(count(*) AS BIGINT) AS n_docs,
              |  min(degree) AS min_degree, max(degree) AS max_degree
              |FROM deg GROUP BY 1""".stripMargin)),

    // CROSS-SOURCE DUPLICATION MATRIX: how much of each source pair the
    // MinHash-LSH candidate graph links — the diagnostic that decides
    // which sources to dedup AGAINST each other before mixing (a corpus
    // that heavily duplicates another contributes fewer effective
    // tokens). Bounded join of the candidate pairs to the source column
    // on both endpoints, one groupBy over the ≤ sources² matrix;
    // within-source pairs keep the diagonal honest.
    Q("cross_source_dup_matrix",
      (s, dir) => {
        val src = docs(s, dir).select(col("doc_id"), col("source"))
        val pairs = lshCandidates(s, dir)
          .join(src, Seq("doc_id"))
          .join(src.select(col("doc_id").as("doc_id_2"),
            col("source").as("source_2")), Seq("doc_id_2"))
        pairs
          .select(least(col("source"), col("source_2")).as("source_a"),
            greatest(col("source"), col("source_2")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_candidate_pairs"))
      },
      Some(s"""WITH $lshCandSql,
              |lab AS (
              |  SELECT c.doc_id, c.doc_id_2, a.source AS sa, b.source AS sb
              |  FROM cands c
              |  JOIN documents a ON a.doc_id = c.doc_id
              |  JOIN documents b ON b.doc_id = c.doc_id_2)
              |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
              |  cast(count(*) AS BIGINT) AS n_candidate_pairs
              |FROM lab GROUP BY 1, 2""".stripMargin)),

    // TEXT NORMALIZATION pass: casefold + collapse whitespace + strip a
    // fixed accent map + drop control chars — the canonicalization that
    // runs BEFORE hashing/dedup so near-identical bytes collide. The
    // normalized text round-trips through md5 so the oracle verifies the
    // exact output bytes; `changed` counts how much of the corpus the
    // pass actually touches. Stateless codegen'd projection, zero
    // shuffle.
    Q("text_normalize",
      (s, dir) => {
        val folded = translate(lower(col("text")),
          "àáâãäåèéêëìíîïòóôõöùúûüçñ", "aaaaaaeeeeiiiiooooouuuucn")
        val squeezed = trim(regexp_replace(
          // explicit ASCII control range: Java's \p{Cntrl} and RE2's
          // \p{Cc} disagree on the C1 block
          regexp_replace(folded, "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))
        docs(s, dir).select(
          col("doc_id"),
          md5(squeezed).as("norm_md5"),
          length(squeezed).cast("long").as("norm_len"),
          (squeezed =!= col("text")).as("changed"))
      },
      Some("""WITH n AS (
             |  SELECT doc_id, text,
             |    trim(regexp_replace(regexp_replace(
             |      translate(lower(text),
             |        'àáâãäåèéêëìíîïòóôõöùúûüçñ', 'aaaaaaeeeeiiiiooooouuuucn'),
             |      '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
             |  FROM documents)
             |SELECT doc_id, md5(norm) AS norm_md5,
             |  cast(length(norm) AS BIGINT) AS norm_len,
             |  norm <> text AS changed
             |FROM n""".stripMargin)),

    // MUTUAL INFORMATION between the lang and source columns — the
    // feature-redundancy diagnostic a mixture designer reads before
    // stratifying on both (MI ≈ 0 ⇒ independent strata; NMI → 1 ⇒ one
    // implies the other and double-stratification over-fragments).
    // One groupBy to the bounded contingency table, marginals broadcast,
    // entropies/MI as exact-count arithmetic summed over ≤ |langs|·
    // |sources| cells.
    Q("lang_source_mi",
      (s, dir) => {
        val cells = docs(s, dir).groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("nij"))
        val ml = cells.groupBy("lang").agg(sum(col("nij")).as("ni"))
        val ms = cells.groupBy("source").agg(sum(col("nij")).as("nj"))
        val tot = cells.agg(sum(col("nij")).as("n"))
        val joined = cells.join(broadcast(ml), "lang")
          .join(broadcast(ms), "source").crossJoin(broadcast(tot))
        val p = col("nij").cast("double") / col("n")
        val term = p * log(p * col("n").cast("double") * col("n") /
          (col("ni") * col("nj")))
        val hl = -(col("ni").cast("double") / col("n")) *
          log(col("ni").cast("double") / col("n"))
        joined.agg(
            count(lit(1)).as("n_cells"),
            round(sum(term), 6).as("mi"))
          .crossJoin(broadcast(
            ml.crossJoin(broadcast(tot)).agg(round(sum(hl), 6).as("h_lang"))))
          .select(col("n_cells"), col("mi"), col("h_lang"),
            round(col("mi") / col("h_lang"), 6).as("nmi_vs_lang"))
      },
      Some("""WITH cells AS (
             |  SELECT lang, source, cast(count(*) AS BIGINT) AS nij
             |  FROM documents GROUP BY 1, 2),
             |ml AS (SELECT lang, cast(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
             |ms AS (SELECT source, cast(sum(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
             |tot AS (SELECT cast(sum(nij) AS BIGINT) AS n FROM cells),
             |mi AS (
             |  SELECT cast(count(*) AS BIGINT) AS n_cells,
             |    round(sum((cast(nij AS double) / n)
             |      * ln(cast(nij AS double) * n / (ni * cast(nj AS double)))), 6)
             |      AS mi
             |  FROM cells JOIN ml USING (lang) JOIN ms USING (source), tot),
             |hl AS (
             |  SELECT round(sum(-(cast(ni AS double) / n)
             |    * ln(cast(ni AS double) / n)), 6) AS h_lang
             |  FROM ml, tot)
             |SELECT mi.n_cells, mi.mi, hl.h_lang,
             |  round(mi.mi / hl.h_lang, 6) AS nmi_vs_lang
             |FROM mi, hl""".stripMargin)),

    // BPE MERGE CANDIDATES (the first iteration of byte-pair-encoding
    // vocabulary induction): count adjacent CHARACTER pairs inside
    // lowercase words across the corpus and emit the top 20 merges — the
    // highest-count pair is exactly what BPE would merge first. Pure
    // per-row explode of in-row bigrams (map-side), one groupBy(pair)
    // with partial aggregation, TakeOrderedAndProject top-k — no global
    // sort, no shuffle beyond the bounded pair domain.
    Q("bpe_merge_candidates",
      (s, dir) => docs(s, dir)
        // filter single-char words FIRST: sequence(1, 0) DESCENDS in Spark
        // while DuckDB's range(1, 1) is empty
        .select(explode(expr(
          """flatten(transform(
            |  filter(regexp_extract_all(lower(text), '[a-z]+', 0),
            |         w -> length(w) > 1),
            |  w -> transform(sequence(1, length(w) - 1),
            |    i -> substring(w, i, 2))))""".stripMargin)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(20),
      Some("""WITH pairs AS (
             |  SELECT unnest(flatten(list_transform(
             |    list_filter(regexp_extract_all(lower(text), '[a-z]+'),
             |                w -> length(w) > 1),
             |    w -> list_transform(range(1, length(w)),
             |      i -> substr(w, cast(i AS int), 2))))) AS pair
             |  FROM documents)
             |SELECT pair, cast(count(*) AS BIGINT) AS n
             |FROM pairs GROUP BY pair
             |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin)),

    // n-gram Jaccard near-dup verify: candidate pairs come from the MinHash
    // LSH band buckets (bucketed generation, not all-pairs), then the exact
    // Jaccard over distinct word-3-gram sets confirms/rejects each candidate.
    Q("ngram_jaccard",
      (s, dir) => {
        val d = docs(s, dir)
          .withColumn("words", split(col("text"), "\\s+"))
          .select(col("doc_id"), array_distinct(expr(shinglesExpr)).as("sh"))
        val d2 = d.select(col("doc_id").as("doc_id_2"), col("sh").as("sh2"))
        lshCandidates(s, dir)
          .join(d, Seq("doc_id"))
          .join(d2, Seq("doc_id_2"))
          .select(col("doc_id"), col("doc_id_2"),
            (size(array_intersect(col("sh"), col("sh2"))).cast("double") /
              size(array_union(col("sh"), col("sh2")))).as("jaccard"))
      },
      Some(s"""WITH $lshCandSql,
              |shd AS (SELECT doc_id, list(shingle) AS sh FROM sh0 GROUP BY doc_id)
              |SELECT c.doc_id, c.doc_id_2,
              |  cast(len(list_intersect(a.sh, b.sh)) AS double) /
              |    len(list_distinct(a.sh || b.sh)) AS jaccard
              |FROM cands c JOIN shd a ON a.doc_id = c.doc_id
              |             JOIN shd b ON b.doc_id = c.doc_id_2""".stripMargin)),

    // EDIT-DISTANCE VERIFY over the LSH candidates: Levenshtein on the
    // raw text, normalized by the longer side — the character-level
    // confirmation pass that catches what set measures can't (shingle
    // sets are order-blind; edit distance isn't). Bounded candidate set
    // only — never all-pairs; levenshtein is exact integer DP in both
    // engines.
    Q("edit_distance_verify",
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val d2 = d.select(col("doc_id").as("doc_id_2"), col("text").as("text_2"))
        lshCandidates(s, dir)
          .join(d, Seq("doc_id")).join(d2, Seq("doc_id_2"))
          .select(col("doc_id"), col("doc_id_2"),
            levenshtein(col("text"), col("text_2")).cast("long").as("edit_dist"),
            round(lit(1.0) - levenshtein(col("text"), col("text_2")) /
              greatest(length(col("text")), length(col("text_2")))
                .cast("double"), 6).as("edit_sim"))
      },
      Some(s"""WITH $lshCandSql
              |SELECT c.doc_id, c.doc_id_2,
              |  cast(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
              |  round(1.0 - cast(levenshtein(a.text, b.text) AS double)
              |    / greatest(length(a.text), length(b.text)), 6) AS edit_sim
              |FROM cands c JOIN documents a ON a.doc_id = c.doc_id
              |             JOIN documents b ON b.doc_id = c.doc_id_2""".stripMargin)),

    // N-GRAM CONTAINMENT over the LSH candidates: |A∩B|/|A| per
    // direction — the ASYMMETRIC dup detector Jaccard can't express (a
    // short doc fully embedded in a long one scores low Jaccard but
    // containment 1.0; that's the quote/aggregation-page case). Same
    // bounded candidate set and shingle join as ngram_jaccard; one extra
    // projection emits both directions.
    Q("ngram_containment",
      (s, dir) => {
        val d = docs(s, dir)
          .withColumn("words", split(col("text"), "\\s+"))
          .select(col("doc_id"), array_distinct(expr(shinglesExpr)).as("sh"))
        val d2 = d.select(col("doc_id").as("doc_id_2"), col("sh").as("sh2"))
        lshCandidates(s, dir)
          .join(d, Seq("doc_id"))
          .join(d2, Seq("doc_id_2"))
          .select(col("doc_id"), col("doc_id_2"),
            size(array_intersect(col("sh"), col("sh2"))).cast("long")
              .as("n_common"),
            round(size(array_intersect(col("sh"), col("sh2"))).cast("double") /
              size(col("sh")), 6).as("containment_a_in_b"),
            round(size(array_intersect(col("sh"), col("sh2"))).cast("double") /
              size(col("sh2")), 6).as("containment_b_in_a"))
      },
      Some(s"""WITH $lshCandSql,
              |shd AS (SELECT doc_id, list(shingle) AS sh FROM sh0 GROUP BY doc_id)
              |SELECT c.doc_id, c.doc_id_2,
              |  cast(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
              |  round(cast(len(list_intersect(a.sh, b.sh)) AS double)
              |    / len(a.sh), 6) AS containment_a_in_b,
              |  round(cast(len(list_intersect(a.sh, b.sh)) AS double)
              |    / len(b.sh), 6) AS containment_b_in_a
              |FROM cands c JOIN shd a ON a.doc_id = c.doc_id
              |             JOIN shd b ON b.doc_id = c.doc_id_2""".stripMargin)),

    // SimHash (32-bit) near-dup fingerprint + hamming distance to next doc
    Q("simhash",
      (s, dir) => {
        // per-token 32-bit hash from md5 hex; simhash bit j = sign of
        // sum(+1/-1 over tokens) at bit j
        val tok = docs(s, dir).select(col("doc_id"),
          explode(split(col("text"), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
          .select(col("doc_id"),
            conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
        // bit j via shift+mask (integral, no double division; same value as
        // the oracle's h // 2^j % 2 for non-negative h)
        val bits = (0 until 32).map(j =>
          sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1, 1)
            .otherwise(-1)).as(s"b$j"))
        val sh = tok.groupBy("doc_id").agg(bits.head, bits.tail: _*)
        val simhash = (0 until 32).map(j =>
          when(col(s"b$j") > 0, math.pow(2, j).toLong).otherwise(0L)).reduce(_ + _)
        val fp = sh.select(col("doc_id"), simhash.as("simhash"))
        val fp2 = fp.select(col("doc_id").as("doc_id_2"), col("simhash").as("simhash_2"))
        // hamming verify over the LSH band-bucket candidates (not adjacency)
        lshCandidates(s, dir)
          .join(fp, Seq("doc_id")).join(fp2, Seq("doc_id_2"))
          .select(col("doc_id"), col("doc_id_2"), col("simhash"), col("simhash_2"),
            bit_count(expr("simhash ^ simhash_2")).cast("long").as("hamming"))
      },
      Some(s"""WITH $lshCandSql,
             |tok AS (
             |  SELECT doc_id,
             |    cast(('0x' || substr(md5(u.tok), 1, 8)) AS BIGINT) AS h
             |  FROM documents, UNNEST(regexp_split_to_array(text, '\\s+')) AS u(tok)
             |  WHERE length(u.tok) > 0),
             |bits AS (
             |  SELECT doc_id, j,
             |    sum(CASE WHEN (h // cast(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
             |  FROM tok, range(0, 32) AS r(j) GROUP BY doc_id, j),
             |fp AS (
             |  SELECT doc_id,
             |    cast(sum(CASE WHEN s > 0 THEN cast(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM bits GROUP BY doc_id)
             |SELECT c.doc_id, c.doc_id_2, a.simhash, b.simhash AS simhash_2,
             |  cast(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
             |FROM cands c JOIN fp a ON a.doc_id = c.doc_id
             |             JOIN fp b ON b.doc_id = c.doc_id_2""".stripMargin)),

    // MinHash + LSH banding: 8 hash functions, 2 bands × 4 rows;
    // emits candidate near-dup pairs sharing any band bucket
    Q("minhash_lsh",
      (s, dir) => lshCandidates(s, dir),
      Some(s"""WITH $lshCandSql
             |SELECT doc_id, doc_id_2 FROM cands""".stripMargin)),

    // LSH band-parameter SWEEP: precision/recall of every (bands ×
    // rows-per-band) factorization of the 8-minhash signature, evaluated
    // on a BOUNDED sample (doc_id < 100) against exact-Jaccard ≥ 0.5
    // ground truth. This is the tuning table that picks (b, r) before
    // committing a corpus-scale dedup run: more bands ⇒ higher recall,
    // lower precision. The ground-truth all-pairs is legitimate ONLY
    // because the sample is fixed-size by construction (the corpus-scale
    // path stays bucketed); the sweep itself reuses the exact signature
    // definition from graft.ops.MinHash, so the chosen config transfers.
    Q("lsh_band_sweep",
      (s, dir) => {
        import s.implicits._
        val sample = docs(s, dir).filter(col("doc_id") < 100)
        val sig = graft.ops.MinHash.signatures(sample)
          .withColumn("cs", split(col("sig"), "\\|"))
        val cfgs = Seq((1L, 8L), (2L, 4L), (4L, 2L), (8L, 1L))
        val bands = cfgs.map { case (nb, r) =>
          sig.select(lit(nb).as("n_bands"), lit(r).as("rows_per_band"),
            col("doc_id"),
            explode(array((0 until nb.toInt).map(b => lit(b)): _*)).as("band"),
            col("cs"))
            .withColumn("bucket", md5(concat(
              col("band").cast("string"), lit("#"),
              concat_ws("|",
                slice(col("cs"), col("band") * r.toInt + lit(1), lit(r.toInt))))))
            .select(col("n_bands"), col("rows_per_band"), col("doc_id"),
              col("band"), col("bucket"))
        }.reduce(_ unionByName _)
        val b2 = bands.select(col("n_bands").as("nb2"),
          col("rows_per_band").as("r2"), col("doc_id").as("doc_id_2"),
          col("band").as("band_2"), col("bucket").as("bucket_2"))
        val cands = bands.join(b2,
            col("n_bands") === col("nb2") && col("rows_per_band") === col("r2") &&
            col("band") === col("band_2") && col("bucket") === col("bucket_2") &&
            col("doc_id") < col("doc_id_2"))
          .select(col("n_bands"), col("rows_per_band"),
            col("doc_id"), col("doc_id_2"))
          .distinct()
        val shingleSets = sample
          .withColumn("words", split(col("text"), "\\s+"))
          .select(col("doc_id"),
            array_distinct(expr(graft.ops.MinHash.shinglesExpr)).as("sh"))
          .filter(size(col("sh")) > 0)
        val t2 = shingleSets.select(col("doc_id").as("doc_id_2"),
          col("sh").as("sh2"))
        val truth = shingleSets.join(broadcast(t2),
            col("doc_id") < col("doc_id_2"))
          .filter(size(array_intersect(col("sh"), col("sh2"))).cast("double") /
            size(array_union(col("sh"), col("sh2"))) >= 0.5)
          .select(col("doc_id"), col("doc_id_2"))
        val nTruth = truth.agg(count(lit(1)).as("n_truth"))
        val keys = Seq("n_bands", "rows_per_band")
        val perCfg = cands.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n_cands"))
        val hits = cands.join(truth, Seq("doc_id", "doc_id_2"))
          .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_hit"))
        cfgs.toDF("n_bands", "rows_per_band")
          .join(perCfg, keys, "left").join(hits, keys, "left")
          .crossJoin(broadcast(nTruth))
          .select(col("n_bands"), col("rows_per_band"),
            coalesce(col("n_cands"), lit(0L)).as("n_cands"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_truth"),
            round(try_divide(coalesce(col("n_hit"), lit(0L)),
              coalesce(col("n_cands"), lit(0L))), 6).as("prec"),
            round(try_divide(coalesce(col("n_hit"), lit(0L)),
              col("n_truth")), 6).as("recall"))
      },
      Some(s"""WITH w AS (
             |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS words
             |  FROM documents WHERE doc_id < 100),
             |shl AS (SELECT doc_id, $shinglesSqlDuck AS shs FROM w),
             |sh0 AS (SELECT DISTINCT doc_id, u.shingle
             |        FROM shl, UNNEST(shs) AS u(shingle)),
             |sh AS (
             |  SELECT doc_id,
             |    cast(('0x' || substr(md5(shingle), 1, 15)) AS UBIGINT)
             |      % 1073741824 AS u
             |  FROM sh0),
             |fam(j, a, b) AS (VALUES (0, 1299721, 11), (1, 2750159, 103),
             |  (2, 4256233, 1009), (3, 5800079, 10007), (4, 7368787, 100003),
             |  (5, 8960453, 1000003), (6, 10570841, 233), (7, 12195257, 377)),
             |mh AS (
             |  SELECT doc_id, j,
             |    cast(min((a * u + b) % 1073741789) AS VARCHAR) AS mh
             |  FROM sh, fam GROUP BY doc_id, j),
             |sig AS (
             |  SELECT doc_id, string_agg(mh, '|' ORDER BY j) AS sig
             |  FROM mh GROUP BY doc_id),
             |comp AS (
             |  SELECT doc_id, regexp_split_to_array(sig, '\\|') AS cs FROM sig),
             |cfg(nb, r) AS (VALUES (1, 8), (2, 4), (4, 2), (8, 1)),
             |bands AS (
             |  SELECT c.nb, c.r, doc_id, b.band,
             |    md5(cast(b.band AS varchar) || '#' ||
             |        array_to_string(cs[b.band*c.r+1:b.band*c.r+c.r], '|'))
             |      AS bucket
             |  FROM comp, cfg c, range(0, 8) b(band)
             |  WHERE b.band < c.nb),
             |cands AS (
             |  SELECT DISTINCT a.nb, a.r, a.doc_id, b.doc_id AS doc_id_2
             |  FROM bands a JOIN bands b ON a.nb = b.nb AND a.r = b.r
             |    AND a.band = b.band AND a.bucket = b.bucket
             |    AND a.doc_id < b.doc_id),
             |shd AS (SELECT doc_id, list(shingle) AS sh FROM sh0 GROUP BY doc_id),
             |truth AS (
             |  SELECT a.doc_id, b.doc_id AS doc_id_2
             |  FROM shd a JOIN shd b ON a.doc_id < b.doc_id
             |  WHERE cast(len(list_intersect(a.sh, b.sh)) AS double)
             |      / len(list_distinct(a.sh || b.sh)) >= 0.5),
             |tt AS (SELECT cast(count(*) AS BIGINT) AS n_truth FROM truth),
             |pc AS (SELECT nb, r, cast(count(*) AS BIGINT) AS n_cands
             |       FROM cands GROUP BY nb, r),
             |ht AS (
             |  SELECT c.nb, c.r, cast(count(*) AS BIGINT) AS n_hit
             |  FROM cands c JOIN truth t
             |    ON t.doc_id = c.doc_id AND t.doc_id_2 = c.doc_id_2
             |  GROUP BY c.nb, c.r)
             |SELECT cast(cfg.nb AS BIGINT) AS n_bands,
             |  cast(cfg.r AS BIGINT) AS rows_per_band,
             |  cast(coalesce(pc.n_cands, 0) AS BIGINT) AS n_cands,
             |  cast(coalesce(ht.n_hit, 0) AS BIGINT) AS n_hit, tt.n_truth,
             |  round(cast(coalesce(ht.n_hit, 0) AS double)
             |    / nullif(coalesce(pc.n_cands, 0), 0), 6) AS prec,
             |  round(cast(coalesce(ht.n_hit, 0) AS double)
             |    / nullif(tt.n_truth, 0), 6) AS recall
             |FROM cfg LEFT JOIN pc ON pc.nb = cfg.nb AND pc.r = cfg.r
             |         LEFT JOIN ht ON ht.nb = cfg.nb AND ht.r = cfg.r
             |         CROSS JOIN tt""".stripMargin)),

    // STATEFUL candidate maintenance (graft.ops.IncrementalLsh) — the
    // multi-batch big sibling of the one-shot `lsh_incremental` delta
    // check below: the corpus arrives in 3 batches; each ingest signatures
    // only the new docs, probes the STORED membership of the touched band
    // buckets, and appends pair/tombstone deltas exactly-once. The oracle
    // is the ONE-SHOT chain over the whole corpus — the driver-checked
    // invariant is accumulated-incremental == batch, the property that
    // lets a growing corpus skip the O(corpus) re-shingle per arrival.
    Q("lsh_maintain",
      (s, dir) => {
        val store = new graft.runtime.TxLogTable(
          s, DvQueries.tmpWarehouse("graft_lsh_inc"))
        val d = docs(s, dir)
        (0L until 3L).foreach { i =>
          graft.ops.IncrementalLsh.ingest(store, "docs",
            d.filter(pmod(col("doc_id"), lit(3L)) === lit(i)),
            batchId = i, cap = MaxBucketSize)
          // mid-stream clustered compaction: layout maintenance must never
          // change the candidate set (the oracle would catch it)
          if (i == 1L) graft.ops.IncrementalLsh.optimize(store, "docs")
        }
        graft.ops.IncrementalLsh.candidates(store, "docs")
      },
      Some(s"""WITH $lshCandSql
             |SELECT doc_id, doc_id_2 FROM cands""".stripMargin)),

    // near-dup CLUSTERING: connected components over the LSH candidate
    // pairs (iterative min-label propagation, O(component diameter)
    // rounds, lineage truncated per round), then one canonical keep-doc
    // per cluster — the step between candidate pairs and actual deletion.
    Q("dedup_clusters",
      (s, dir) => clusterLabels(s, dir)
        .withColumn("keep", col("doc_id") === col("cluster_id")),
      Some(s"""WITH RECURSIVE $lshCandSql,
             |edges AS (
             |  SELECT doc_id AS a, doc_id_2 AS b FROM cands
             |  UNION ALL SELECT doc_id_2, doc_id FROM cands),
             |nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
             |reach AS (
             |  SELECT doc_id AS src, doc_id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst)
             |SELECT src AS doc_id, MIN(dst) AS cluster_id,
             |       (src = MIN(dst)) AS keep
             |FROM reach GROUP BY src""".stripMargin)),

    // retention policy after clustering: keep ONE representative per
    // near-dup cluster, chosen by QUALITY (longest doc, doc_id tiebreak) —
    // the decision step a real dedup pipeline runs between clustering and
    // deletion; a distributed argmax (one window over cluster_id), never a
    // driver-side pick.
    // DUPLICATE-AWARE MIXTURE WEIGHTS: training-data sampling that
    // down-weights near-duplicate clusters — each doc carries weight
    // 1/|its cluster| (singletons weight 1), so a story crawled 40×
    // contributes one effective document. Rolled up per source:
    // raw vs EFFECTIVE doc/char counts and the over-representation
    // ratio the mixture sampler must correct for. Reuses the shared
    // cluster builder; one extra groupBy for cluster sizes.
    Q("dedup_weighted_mix",
      (s, dir) => {
        val lab = docs(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .join(clusterLabels(s, dir).select(col("doc_id"), col("cluster_id")),
            Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        val csize = lab.groupBy("cluster_id").agg(count(lit(1)).as("csz"))
        lab.join(csize, Seq("cluster_id"))
          .withColumn("wt", lit(1.0) / col("csz"))
          .groupBy("source")
          .agg(count(lit(1)).as("raw_docs"),
            round(sum("wt"), 4).as("effective_docs"),
            sum("n_chars").as("raw_chars"),
            round(sum(col("n_chars") * col("wt")), 1).as("effective_chars"))
          .withColumn("overrep_ratio",
            round(col("raw_docs") / col("effective_docs"), 4))
      },
      Some(s"""WITH RECURSIVE $lshCandSql,
              |edges AS (
              |  SELECT doc_id AS a, doc_id_2 AS b FROM cands
              |  UNION ALL SELECT doc_id_2, doc_id FROM cands),
              |nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
              |reach AS (
              |  SELECT doc_id AS src, doc_id AS dst FROM nodes
              |  UNION
              |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
              |labels AS (
              |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
              |lab AS (
              |  SELECT d.doc_id, d.source, d.n_chars,
              |    coalesce(l.cluster_id, d.doc_id) AS cluster_id
              |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
              |cs AS (SELECT cluster_id, count(*) AS csz FROM lab GROUP BY 1),
              |wmix AS (SELECT lab.source, lab.n_chars, 1.0 / cs.csz AS wt
              |      FROM lab JOIN cs USING (cluster_id))
              |SELECT source, cast(count(*) AS BIGINT) AS raw_docs,
              |  round(sum(wt), 4) AS effective_docs,
              |  cast(sum(n_chars) AS BIGINT) AS raw_chars,
              |  round(sum(n_chars * wt), 1) AS effective_chars,
              |  round(count(*) / round(sum(wt), 4), 4) AS overrep_ratio
              |FROM wmix GROUP BY 1""".stripMargin)),

    Q("dedup_keep_best",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val quality = docs(s, dir).select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("n_words"))
        val w = Window.partitionBy("cluster_id")
          .orderBy(col("n_words").desc, col("doc_id").asc)
        clusterLabels(s, dir)
          .join(quality, Seq("doc_id"))
          .withColumn("rank_in_cluster", row_number().over(w).cast("long"))
          .withColumn("keep", col("rank_in_cluster") === 1)
      },
      Some(s"""WITH RECURSIVE $lshCandSql,
             |edges AS (
             |  SELECT doc_id AS a, doc_id_2 AS b FROM cands
             |  UNION ALL SELECT doc_id_2, doc_id FROM cands),
             |nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
             |reach AS (
             |  SELECT doc_id AS src, doc_id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
             |labels AS (
             |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
             |quality AS (
             |  SELECT doc_id, cast(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_words
             |  FROM documents)
             |SELECT l.doc_id, l.cluster_id, q.n_words,
             |  cast(ROW_NUMBER() OVER (PARTITION BY l.cluster_id
             |    ORDER BY q.n_words DESC, l.doc_id ASC) AS BIGINT) AS rank_in_cluster,
             |  (ROW_NUMBER() OVER (PARTITION BY l.cluster_id
             |    ORDER BY q.n_words DESC, l.doc_id ASC) = 1) AS keep
             |FROM labels l JOIN quality q ON q.doc_id = l.doc_id""".stripMargin)),

    // PageRank over the near-dup candidate graph (3 power iterations,
    // damping 0.85): centrality ranks a cluster's documents by how densely
    // duplicated they are — the "template-ness" signal a boilerplate triage
    // uses on top of the binary keep/drop from clustering. Fully
    // distributed and iteration-bounded (no fixpoint probe needed): per
    // iteration one equi-join (ranks→edges on src) and one partial
    // aggregation (sum of shares by dst). The two scalar denominators ride
    // a 1-row broadcast (BroadcastNestedLoopJoin), never a driver collect.
    // At 100 TB scale: pre-partition `edges` by src once and the join side
    // of every iteration reuses that exchange; the candidate graph is LSH
    // output, i.e. orders of magnitude smaller than the corpus. The oracle
    // unrolls the same three iterations as plain SQL.
    Q("pagerank_sim",
      (s, dir) => {
        val cands = lshCandidates(s, dir)
        // parallelism derived from the edge count (the GraphOps convention,
        // ~250k edges/partition): the cached candidate frame keeps its
        // upstream partition count, so an unkeyed repartition inherits 32
        // near-empty shards and every iteration pays 32-task scheduling for
        // a few thousand rows; at large scale the same expression widens
        val nParts = math.max(1L, math.min(s.sparkContext.defaultParallelism.toLong,
          cands.count() / 250000L)).toInt
        val edges = cands
          .select(col("doc_id").as("src"), col("doc_id_2").as("dst"))
          .unionAll(cands
            .select(col("doc_id_2").as("src"), col("doc_id").as("dst")))
          .repartition(nParts, col("src")) // one exchange, reused by all 3 iterations
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val n = deg.select(count(lit(1)).cast("double").as("n"))
        var ranks = deg.crossJoin(broadcast(n))
          .select(col("src").as("node"), (lit(1.0) / col("n")).as("pr"))
        for (_ <- 1 to 3) {
          val inflow = ranks
            .join(deg, col("node") === col("src"))
            .select(col("node"), (col("pr") / col("deg")).as("share"))
            .join(edges.withColumnRenamed("src", "e_src"),
              col("node") === col("e_src"))
            .groupBy(col("dst"))
            .agg(sum(col("share")).as("inflow"))
          ranks = inflow.crossJoin(broadcast(n))
            .select(col("dst").as("node"),
              (lit(0.15) / col("n") + lit(0.85) * col("inflow")).as("pr"))
        }
        ranks.select(col("node").as("doc_id"),
          round(col("pr"), 4).as("pagerank"))
      },
      Some(s"""WITH $lshCandSql,
             |edges AS (
             |  SELECT doc_id AS src, doc_id_2 AS dst FROM cands
             |  UNION ALL SELECT doc_id_2, doc_id FROM cands),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
             |n AS (SELECT cast(count(*) AS double) AS n FROM deg),
             |r0 AS (SELECT src AS node,
             |         cast(1.0 AS double) / (SELECT n FROM n) AS pr FROM deg),
             |r1 AS (SELECT e.dst AS node,
             |         cast(0.15 AS double) / (SELECT n FROM n)
             |           + 0.85 * sum(r.pr / d.deg) AS pr
             |       FROM r0 r JOIN deg d ON d.src = r.node
             |       JOIN edges e ON e.src = r.node GROUP BY e.dst),
             |r2 AS (SELECT e.dst AS node,
             |         cast(0.15 AS double) / (SELECT n FROM n)
             |           + 0.85 * sum(r.pr / d.deg) AS pr
             |       FROM r1 r JOIN deg d ON d.src = r.node
             |       JOIN edges e ON e.src = r.node GROUP BY e.dst),
             |r3 AS (SELECT e.dst AS node,
             |         cast(0.15 AS double) / (SELECT n FROM n)
             |           + 0.85 * sum(r.pr / d.deg) AS pr
             |       FROM r2 r JOIN deg d ON d.src = r.node
             |       JOIN edges e ON e.src = r.node GROUP BY e.dst)
             |SELECT node AS doc_id, round(pr, 4) AS pagerank FROM r3""".stripMargin)),

    // Degree-ordered triangle counting + local clustering coefficient over
    // the candidate graph: how CLIQUE-LIKE each document's near-dup
    // neighborhood is (mirror-cluster boilerplate closes its triangles;
    // chain-shaped false-positive paths don't). The scale-critical trick is
    // the ORIENTATION: every edge points toward its higher-(degree, id)
    // endpoint, so wedges are enumerated only at each triangle's
    // lowest-rank vertex — per-node wedge work is choose(out-deg, 2) with
    // out-degree bounded by O(√|E|) (and here additionally by the LSH
    // bucket cap), instead of choose(deg, 2) blowing up on hubs. The
    // closure probe is an equi-join on the id-canonical edge key. The
    // oracle enumerates the same triangle set by plain id-ordering —
    // orientation changes the work, never the result.
    Q("triangle_count",
      (s, dir) => {
        val cands = lshCandidates(s, dir) // distinct pairs, doc_id < doc_id_2
        val deg = cands.select(col("doc_id").as("node"))
          .unionAll(cands.select(col("doc_id_2").as("node")))
          .groupBy("node").agg(count(lit(1)).as("degree"))
        val withDeg = cands
          .join(deg.select(col("node").as("doc_id"), col("degree").as("da")),
            Seq("doc_id"))
          .join(deg.select(col("node").as("doc_id_2"), col("degree").as("db")),
            Seq("doc_id_2"))
        val aLower = (col("da") < col("db")) ||
          (col("da") === col("db") && col("doc_id") < col("doc_id_2"))
        // edge-count-derived parallelism + localCheckpoint (the GraphOps
        // convention): `oriented` feeds THREE consumers (both wedge sides
        // and the closure probe) — uncheckpointed, each re-executed the
        // cands⋈deg⋈deg build, and the cached candidate frame's inherited
        // 32-shard partitioning made every re-execution a 32-task stage
        // over a few thousand rows
        val nParts = math.max(1L, math.min(s.sparkContext.defaultParallelism.toLong,
          cands.count() / 250000L)).toInt
        val oriented = withDeg.select(
          when(aLower, col("doc_id")).otherwise(col("doc_id_2")).as("src"),
          when(aLower, col("doc_id_2")).otherwise(col("doc_id")).as("dst"))
          .repartition(nParts, col("src"))
          .localCheckpoint()
        val wedges = oriented
          .join(oriented.select(col("src").as("src2"), col("dst").as("dst2")),
            col("src") === col("src2") && col("dst") < col("dst2"))
          .select(col("src"), col("dst").as("lo"), col("dst2").as("hi"))
        val closure = oriented.select(
          least(col("src"), col("dst")).as("lo"),
          greatest(col("src"), col("dst")).as("hi"))
        val tris = wedges.join(closure, Seq("lo", "hi")) // one row per triangle
        val perNode = tris
          .select(explode(array(col("src"), col("lo"), col("hi"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("triangles"))
        deg.join(perNode, Seq("node"), "left")
          .select(col("node").as("doc_id"), col("degree"),
            coalesce(col("triangles"), lit(0L)).as("triangles"),
            round(when(col("degree") > 1,
              lit(2.0) * coalesce(col("triangles"), lit(0L)) /
                (col("degree") * (col("degree") - lit(1L))))
              .otherwise(lit(0.0)), 4).as("clustering_coeff"))
      },
      Some(s"""WITH $lshCandSql,
             |tris AS (
             |  SELECT a.doc_id AS x, a.doc_id_2 AS y, b.doc_id_2 AS z
             |  FROM cands a
             |  JOIN cands b ON b.doc_id = a.doc_id AND b.doc_id_2 > a.doc_id_2
             |  JOIN cands c ON c.doc_id = a.doc_id_2 AND c.doc_id_2 = b.doc_id_2),
             |pern AS (
             |  SELECT node, count(*) AS t FROM (
             |    SELECT x AS node FROM tris
             |    UNION ALL SELECT y FROM tris
             |    UNION ALL SELECT z FROM tris) GROUP BY node),
             |deg AS (
             |  SELECT node, count(*) AS degree FROM (
             |    SELECT doc_id AS node FROM cands
             |    UNION ALL SELECT doc_id_2 FROM cands) GROUP BY node)
             |SELECT d.node AS doc_id, cast(d.degree AS BIGINT) AS degree,
             |  cast(coalesce(p.t, 0) AS BIGINT) AS triangles,
             |  round(CASE WHEN d.degree > 1
             |    THEN 2.0 * coalesce(p.t, 0) / (d.degree * (d.degree - 1))
             |    ELSE 0.0 END, 4) AS clustering_coeff
             |FROM deg d LEFT JOIN pern p ON p.node = d.node""".stripMargin)),

    // token-budget packing: assign documents to contiguous training-context
    // bins of ~512 whitespace tokens. Deterministic (doc_id order) and
    // embarrassingly parallel: packing runs per SHARD (doc_id % 32), so the
    // running-sum window never needs a global single-partition sort — the
    // shape that survives a 100 TB corpus (one shard ≈ one task).
    Q("token_pack",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 512
        val toks = docs(s, dir).select(col("doc_id"),
          (col("doc_id") % 32).as("shard"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
        val w = Window.partitionBy("shard").orderBy("doc_id")
        toks
          .withColumn("pack_id",
            floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget).cast("long"))
          .select(col("doc_id"), col("shard").cast("long").as("shard"),
            col("n_tokens"), col("pack_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, doc_id % 32 AS shard,
             |    cast(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents)
             |SELECT doc_id, cast(shard AS BIGINT) AS shard, n_tokens,
             |  cast(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
             |    - n_tokens) / 512) AS BIGINT) AS pack_id
             |FROM toks""".stripMargin)),

    // multimodal decode pipeline: binary → typed Dataset[MediaMeta] via
    // mapPartitions with per-partition codec init (graft.multimodal). The
    // decode itself is a deterministic MD5-derived stand-in; the plumbing
    // (typed schema, partition batching, codec lifecycle) is the contract.
    Q("multimodal_decode",
      (s, dir) => graft.multimodal.Multimodal
        .decodeMeta(docs(s, dir).withColumn("blob", col("text").cast("binary")),
          "doc_id", "blob")
        .toDF(),
      Some("""SELECT doc_id,
             |  cast(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image'
             |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             |  cast(16 + cast(('0x' || substr(md5(text), 1, 2)) AS INT) % 112 AS INT) AS width,
             |  cast(16 + cast(('0x' || substr(md5(text), 3, 2)) AS INT) % 112 AS INT) AS height,
             |  cast(1 + octet_length(encode(text)) // 256 AS BIGINT) AS n_frames,
             |  md5(md5(text)) AS thumb_hash
             |FROM documents""".stripMargin)),

    // frame sampling (video-pipeline flatMap shape): up to 3 evenly-indexed
    // frames per document, one signature per frame.
    Q("frame_sample",
      (s, dir) => graft.multimodal.Multimodal
        .sampleFrames(docs(s, dir).withColumn("blob", col("text").cast("binary")),
          "doc_id", "blob", k = 3)
        .toDF(),
      Some("""WITH meta AS (
             |  SELECT doc_id, md5(text) AS hex,
             |    1 + octet_length(encode(text)) // 256 AS n_frames
             |  FROM documents)
             |SELECT doc_id, cast(u.idx AS BIGINT) AS frame_idx,
             |  md5(hex || ':' || cast(u.idx AS varchar)) AS frame_sig
             |FROM meta, UNNEST(range(0, cast(least(n_frames, 3) AS BIGINT))) AS u(idx)""".stripMargin)),

    // multimodal plumbing: opaque binary column + typed metadata extraction
    // (decode step is a deterministic stand-in — real image/audio libs are
    // intentionally out of scope; the schema/batch shape is the contract)
    Q("multimodal_meta",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        col("text").cast("binary").as("blob"))
        .select(col("doc_id"),
          length(col("blob")).cast("long").as("n_bytes"),
          lower(hex(substring(col("blob"), 1, 8))).as("header_hex"),
          substring(col("blob"), 1, 4).cast("string").as("decoded_preview")),
      Some("""SELECT doc_id, cast(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  lower(substr(hex(encode(text)), 1, 16)) AS header_hex,
             |  substr(text, 1, 4) AS decoded_preview
             |FROM documents""".stripMargin)),

    // within-document repetition (the Gopher-style quality rule): the
    // fraction of repeated words / word-bigrams. A pure per-row projection
    // (array_distinct over an in-row array) — zero shuffles, codegen'd,
    // trivially 100 TB-parallel.
    Q("repetition_score",
      (s, dir) => {
        val words = split(col("text"), "\\s+")
        docs(s, dir)
          .select(col("doc_id"), words.as("words"))
          .withColumn("bigrams", expr(
            "CASE WHEN size(words) < 2 THEN array() " +
              "ELSE transform(sequence(1, size(words) - 1), " +
              "i -> concat_ws(' ', slice(words, i, 2))) END"))
          .select(col("doc_id"),
            size(col("words")).cast("long").as("n_words"),
            (lit(1.0) - size(array_distinct(col("words"))).cast("double") /
              size(col("words"))).as("dup_word_frac"),
            when(size(col("bigrams")) === 0, lit(0.0)).otherwise(
              lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") /
                size(col("bigrams"))).as("dup_bigram_frac"))
          .withColumn("keep", col("dup_bigram_frac") <= 0.2)
      },
      Some("""WITH w AS (
             |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS words FROM documents),
             |g AS (
             |  SELECT doc_id, words,
             |    CASE WHEN len(words) < 2 THEN [] ELSE
             |      list_transform(range(1, len(words)), i -> array_to_string(words[i:i+1], ' '))
             |    END AS bigrams
             |  FROM w)
             |SELECT doc_id, cast(len(words) AS BIGINT) AS n_words,
             |  1.0 - len(list_distinct(words)) / cast(len(words) AS double) AS dup_word_frac,
             |  CASE WHEN len(bigrams) = 0 THEN 0.0 ELSE
             |    1.0 - len(list_distinct(bigrams)) / cast(len(bigrams) AS double)
             |  END AS dup_bigram_frac,
             |  (CASE WHEN len(bigrams) = 0 THEN 0.0 ELSE
             |    1.0 - len(list_distinct(bigrams)) / cast(len(bigrams) AS double)
             |  END) <= 0.2 AS keep
             |FROM g""".stripMargin)),

    // benchmark-contamination check (the decontamination step of a training
    // pipeline): per corpus document, how many of its distinct word-5-grams
    // appear in a held-out benchmark set (here: every 50th doc). The
    // benchmark gram set is SMALL by construction → broadcast; the corpus
    // side streams through one explode + one broadcast left join + one
    // partial-aggregating groupBy — no corpus-sized shuffle of raw text,
    // the only shape that survives 100 TB.
    Q("contamination_check",
      (s, dir) => {
        val words = split(col("text"), "\\s+")
        val grams = docs(s, dir)
          .select(col("doc_id"), words.as("words"))
          .select(col("doc_id"), explode(array_distinct(expr(
            "CASE WHEN size(words) < 5 THEN array() " +
              "ELSE transform(sequence(1, size(words) - 4), " +
              "i -> concat_ws(' ', slice(words, i, 5))) END"))).as("gram"))
        val bench = grams.filter(col("doc_id") % 50 === 0)
          .select(col("gram")).distinct().withColumn("__hit", lit(1L))
        grams.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(bench), Seq("gram"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_hit_grams"))
          .withColumn("contaminated", col("n_hit_grams") * 10 >= col("n_grams"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS words FROM documents),
             |g AS (
             |  SELECT DISTINCT doc_id, u.gram
             |  FROM w, UNNEST(CASE WHEN len(words) < 5 THEN [] ELSE
             |    list_transform(range(1, len(words) - 3), i -> array_to_string(words[i:i+4], ' '))
             |    END) AS u(gram)),
             |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
             |SELECT g.doc_id, cast(count(*) AS BIGINT) AS n_grams,
             |  cast(count(b.gram) AS BIGINT) AS n_hit_grams,
             |  count(b.gram) * 10 >= count(*) AS contaminated
             |FROM g LEFT JOIN bench b ON g.gram = b.gram
             |WHERE g.doc_id % 50 != 0
             |GROUP BY g.doc_id""".stripMargin)),

    // deterministic data-mixture sampling: per-domain keep rates applied
    // via a HASH threshold, not rand() — the same doc always gets the same
    // verdict (reproducible mixtures, resumable jobs, no shuffled sampling
    // state). A pure per-row projection: domain → rate, md5(doc_id) → a
    // uniform in [0,1), keep iff u < rate. The production shape for
    // composing a training mix at 100 TB: no sort, no shuffle, no state.
    Q("mixture_sample",
      (s, dir) => {
        val domain = (col("doc_id") % 3).cast("long")
        val rate = when(domain === 0, 1.0)
          .when(domain === 1, 0.5)
          .otherwise(0.1)
        // top 8 hex chars of md5 → uniform over [0, 1)
        val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0))
        docs(s, dir).select(
          col("doc_id"),
          domain.as("domain"),
          rate.as("keep_rate"),
          u.as("u"),
          (u < rate).as("keep"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, doc_id % 3 AS domain,
             |    CASE doc_id % 3 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.1 END AS keep_rate,
             |    cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8)) AS UBIGINT)
             |      / 4294967296.0 AS u
             |  FROM documents)
             |SELECT doc_id, cast(domain AS BIGINT) AS domain, keep_rate, u,
             |  u < keep_rate AS keep
             |FROM d""".stripMargin)),

    // deterministic GLOBAL shuffle + train/val/test split + shard layout —
    // the last step before a corpus becomes a training dataset. Order is
    // by a seeded md5 of the doc id: reproducible (same corpus → same
    // bytes in the same shard slots), incremental-friendly (a doc's split
    // and shard never change as the corpus grows), and free of rand()
    // state. The within-shard position is a per-(split, shard) window —
    // 48 bounded sorts here; at 100 TB you raise the shard count so each
    // shard's sort fits one task, which is exactly how shard files are
    // sized anyway. No global sort anywhere.
    Q("train_shard",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir)
          .select(col("doc_id"),
            md5(concat(lit("ts#"), col("doc_id").cast("string"))).as("h"))
          .withColumn("p",
            conv(substring(col("h"), 1, 8), 16, 10).cast("long") % 100L)
          .withColumn("split_name",
            when(col("p") < 90, "train").when(col("p") < 95, "val")
              .otherwise("test"))
          .withColumn("shard",
            conv(substring(col("h"), 9, 8), 16, 10).cast("long") % 16L)
        d.withColumn("pos", row_number()
            .over(Window.partitionBy("split_name", "shard")
              .orderBy(col("h"), col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("split_name"), col("shard"), col("pos"))
      },
      Some("""WITH th AS (
             |  SELECT doc_id, md5('ts#' || cast(doc_id AS VARCHAR)) AS h
             |  FROM documents),
             |ta AS (
             |  SELECT doc_id, h,
             |    cast(('0x' || substr(h, 1, 8)) AS BIGINT) % 100 AS p,
             |    cast(('0x' || substr(h, 9, 8)) AS BIGINT) % 16 AS shard
             |  FROM th),
             |tb AS (
             |  SELECT doc_id, h, shard,
             |    CASE WHEN p < 90 THEN 'train' WHEN p < 95 THEN 'val'
             |    ELSE 'test' END AS split_name
             |  FROM ta)
             |SELECT doc_id, split_name, shard,
             |  cast(row_number() OVER (PARTITION BY split_name, shard
             |    ORDER BY h, doc_id) AS BIGINT) AS pos
             |FROM tb""".stripMargin)),

    // CURRICULUM ORDERING: lay training examples out easy→hard within
    // deterministic shards — train_shard's layout with the hash order
    // replaced by a difficulty proxy (mean word length, the same rounded
    // scalar quality_deciles calibrates on). Per-(shard) window only —
    // bounded sorts sized by shard count, no global sort; at 100 TB you
    // raise the shard modulus exactly like train_shard.
    Q("curriculum_order",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val words = size(split(col("text"), "\\s+"))
        val d = docs(s, dir).select(col("doc_id"),
          round(length(col("text")).cast("double") / words, 6).as("difficulty"),
          (conv(substring(md5(concat(lit("cur#"), col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("long") % 8L).as("shard"))
        d.withColumn("pos", row_number().over(
            Window.partitionBy("shard").orderBy(col("difficulty"), col("doc_id")))
            .cast("long"))
          .select(col("doc_id"), col("shard"), col("difficulty"), col("pos"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    round(cast(length(text) AS double)
             |      / len(regexp_split_to_array(text, '\s+')), 6) AS difficulty,
             |    cast(('0x' || substr(md5('cur#' || cast(doc_id AS VARCHAR)), 1, 8))
             |      AS BIGINT) % 8 AS shard
             |  FROM documents)
             |SELECT doc_id, shard, difficulty,
             |  cast(row_number() OVER (PARTITION BY shard
             |    ORDER BY difficulty, doc_id) AS BIGINT) AS pos
             |FROM d""".stripMargin)),

    // POISSON-BOOTSTRAP CONFIDENCE INTERVAL for a corpus statistic (mean
    // difficulty): 32 deterministic resampling replicates — each doc's
    // weight in replicate b is a Poisson(1) draw via inverse CDF over an
    // md5(doc,b) uniform (the ONLY bootstrap that streams: no global
    // resample pass, weights are computed row-local) — then the 2.5/97.5
    // percentiles of the replicate means. The cumulative-probability
    // constants are spelled identically in both engines. Scale shape:
    // one 32× row explode (map-side), one groupBy(replicate) to 32 rows,
    // one exact percentile over the bounded replicate table.
    Q("bootstrap_ci",
      (s, dir) => {
        val words = size(split(col("text"), "\\s+"))
        val d = docs(s, dir).select(col("doc_id"),
          round(length(col("text")).cast("double") / words, 6).as("score"))
        val reps = d.select(col("doc_id"), col("score"),
            explode(sequence(lit(0), lit(31))).as("rep"))
          .withColumn("u", conv(substring(md5(concat(lit("bs#"),
            col("doc_id").cast("string"), lit(":"), col("rep").cast("string"))),
            1, 8), 16, 10).cast("double") / 4294967296.0)
          .withColumn("w",
            when(col("u") < 0.36787944117144233, 0L)
              .when(col("u") < 0.7357588823428847, 1L)
              .when(col("u") < 0.9196986029286058, 2L)
              .when(col("u") < 0.9810118431238462, 3L)
              .when(col("u") < 0.9963401531726563, 4L)
              .otherwise(5L))
        val repMeans = reps.groupBy("rep")
          .agg(round(sum(col("w") * col("score")) / sum(col("w")), 6)
            .as("rep_mean"))
        val full = d.agg(round(avg(col("score")), 6).as("mean_score"))
        repMeans.agg(
            count(lit(1)).as("n_replicates"),
            round(expr("percentile(rep_mean, 0.025)"), 6).as("ci_lo"),
            round(expr("percentile(rep_mean, 0.975)"), 6).as("ci_hi"))
          .crossJoin(broadcast(full))
          .select(col("mean_score"), col("n_replicates"),
            col("ci_lo"), col("ci_hi"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    round(cast(length(text) AS double)
             |      / len(regexp_split_to_array(text, '\s+')), 6) AS score
             |  FROM documents),
             |reps AS (
             |  SELECT d.score, r.rep,
             |    cast(('0x' || substr(md5('bs#' || cast(d.doc_id AS VARCHAR)
             |      || ':' || cast(r.rep AS VARCHAR)), 1, 8)) AS BIGINT)
             |      / 4294967296.0 AS u
             |  FROM d, range(0, 32) AS r(rep)),
             |wtab AS (
             |  SELECT rep, score,
             |    CASE WHEN u < 0.36787944117144233 THEN 0
             |         WHEN u < 0.7357588823428847 THEN 1
             |         WHEN u < 0.9196986029286058 THEN 2
             |         WHEN u < 0.9810118431238462 THEN 3
             |         WHEN u < 0.9963401531726563 THEN 4
             |         ELSE 5 END AS w
             |  FROM reps),
             |rm AS (
             |  SELECT rep, round(sum(w * score) / sum(w), 6) AS rep_mean
             |  FROM wtab GROUP BY rep),
             |f AS (SELECT round(avg(score), 6) AS mean_score FROM d)
             |SELECT f.mean_score, cast(count(*) AS BIGINT) AS n_replicates,
             |  round(quantile_cont(rep_mean, 0.025), 6) AS ci_lo,
             |  round(quantile_cont(rep_mean, 0.975), 6) AS ci_hi
             |FROM rm, f GROUP BY f.mean_score""".stripMargin)),

    // PII detection + scrubbing: count and mask email / phone-like / IPv4
    // patterns — the content-safety pass a training pipeline runs before
    // release. Stateless per-row regexes (codegen'd), zero shuffle; the
    // scrubbed text round-trips through md5 so the oracle verifies the
    // REPLACEMENT bytes, not just the counts.
    Q("pii_scrub",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipv4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
        val phone = "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b"
        val scrubbed = regexp_replace(regexp_replace(regexp_replace(col("text"),
          email, "<EMAIL>"), ipv4, "<IP>"), phone, "<PHONE>")
        docs(s, dir).select(
          col("doc_id"),
          regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(ipv4)).cast("long").as("n_ips"),
          regexp_count(col("text"), lit(phone)).cast("long").as("n_phones"),
          md5(scrubbed).as("scrubbed_md5"),
          (regexp_count(col("text"), lit(email)) +
            regexp_count(col("text"), lit(ipv4)) +
            regexp_count(col("text"), lit(phone)) > 0).as("has_pii"))
      },
      Some("""SELECT doc_id,
             |  cast(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  cast(len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
             |  cast(len(regexp_extract_all(text, '\b\d{3}[- .]\d{3}[- .]\d{4}\b')) AS BIGINT) AS n_phones,
             |  md5(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             |    '\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g')) AS scrubbed_md5,
             |  (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |   + len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))
             |   + len(regexp_extract_all(text, '\b\d{3}[- .]\d{3}[- .]\d{4}\b'))) > 0 AS has_pii
             |FROM documents""".stripMargin)),

    // context-window chunking: split each document into overlapping
    // fixed-size token windows (stride < size ⇒ overlap), the shape
    // training examples are actually cut to. Pure per-row explode of an
    // in-row sequence — embarrassingly parallel, no shuffle; chunk count
    // and offsets derive from the token count arithmetically.
    Q("doc_chunks",
      (s, dir) => {
        val win = 64; val stride = 48
        docs(s, dir)
          .select(col("doc_id"), split(col("text"), "\\s+").as("words"))
          .select(col("doc_id"), size(col("words")).as("n_tokens"),
            explode(expr(
              s"transform(sequence(0, greatest(cast(ceil((size(words) - $win) / $stride.0) as int), 0)), " +
                s"i -> struct(i AS idx, i * $stride AS off, " +
                s"concat_ws(' ', slice(words, i * $stride + 1, $win)) AS chunk))")).as("c"))
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            col("c.idx").cast("long").as("chunk_idx"),
            col("c.off").cast("long").as("chunk_off"),
            md5(col("c.chunk")).as("chunk_md5"),
            // arithmetic, not a re-split of the string just joined: the
            // last window simply holds whatever tokens remain
            least(lit(win), col("n_tokens") - col("c.off")).cast("long")
              .as("chunk_tokens"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS words FROM documents),
             |c AS (
             |  SELECT doc_id, len(words) AS n_tokens, u.i AS chunk_idx,
             |    u.i * 48 AS chunk_off,
             |    array_to_string(words[u.i * 48 + 1 : u.i * 48 + 64], ' ') AS chunk
             |  FROM w, UNNEST(range(0,
             |    greatest(cast(ceil((len(words) - 64) / 48.0) AS BIGINT), 0) + 1)) AS u(i))
             |SELECT doc_id, cast(n_tokens AS BIGINT) AS n_tokens,
             |  cast(chunk_idx AS BIGINT) AS chunk_idx,
             |  cast(chunk_off AS BIGINT) AS chunk_off,
             |  md5(chunk) AS chunk_md5,
             |  cast(least(64, n_tokens - chunk_off) AS BIGINT) AS chunk_tokens
             |FROM c""".stripMargin)),

    // TF-IDF top-3 keywords per document — the classic two-phase corpus
    // shape: one pass builds per-doc term frequencies (partial-aggregating
    // groupBy), one tiny aggregate builds the document-frequency table
    // (vocabulary-sized → broadcast), a broadcast join scores, a per-doc
    // window takes the top-k. Scores round to 4 decimals before ranking so
    // cross-engine libm jitter (~1e-13) cannot flip ranks; ties break by
    // term.
    Q("tfidf_keywords",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val terms = docs(s, dir)
          .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(length(col("term")) >= 3)
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val nDocs = docs(s, dir).count()
        // count(tf) not count(*): tf is never NULL so the value is the same,
        // but referencing the tf column stops column pruning from rewriting
        // this branch into a distinct-style aggregate — both branches then
        // canonicalize to the SAME partial-aggregate Exchange and
        // ReuseExchange tokenizes the corpus ONCE instead of twice (the
        // dominant cost at scale)
        val df_ = tf.groupBy("term").agg(count(col("tf")).as("df"))
        val scored = tf.join(broadcast(df_), Seq("term"))
          .select(col("doc_id"), col("term"),
            round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 4).as("tfidf"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("term").asc)
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
      },
      Some("""WITH terms AS (
             |  SELECT doc_id, u.term
             |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z]+') AS ts
             |        FROM documents), UNNEST(ts) AS u(term)
             |  WHERE len(u.term) >= 3),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |scored AS (
             |  SELECT tf.doc_id, tf.term,
             |    round(tf.tf * ln(cast(n.n_docs AS double) / df.df), 4) AS tfidf
             |  FROM tf JOIN df ON tf.term = df.term, n),
             |ranked AS (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |    ORDER BY tfidf DESC, term ASC) AS rank FROM scored)
             |SELECT doc_id, term, tfidf, cast(rank AS BIGINT) AS rank
             |FROM ranked WHERE rank <= 3""".stripMargin)),

    // per-language corpus statistics: doc counts + EXACT token-count
    // percentiles (p50/p90/p99). One partial-aggregating groupBy over a
    // handful of language groups; at 100 TB swap `percentile` for
    // `approx_percentile` (t-digest sketch, same plan shape) — kept exact
    // here so the DuckDB oracle can match byte-for-byte.
    Q("corpus_stats",
      (s, dir) => {
        val lang = (col("doc_id") % 4).cast("long")
        val toks = size(split(col("text"), "\\s+")).cast("long")
        docs(s, dir)
          .select(lang.as("lang_bucket"), toks.as("n_tokens"))
          .groupBy("lang_bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            expr("percentile(n_tokens, 0.5)").as("p50_tokens"),
            expr("percentile(n_tokens, 0.9)").as("p90_tokens"),
            expr("percentile(n_tokens, 0.99)").as("p99_tokens"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id % 4 AS lang_bucket,
             |    cast(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents)
             |SELECT cast(lang_bucket AS BIGINT) AS lang_bucket,
             |  cast(count(*) AS BIGINT) AS n_docs,
             |  cast(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  quantile_cont(n_tokens, 0.5) AS p50_tokens,
             |  quantile_cont(n_tokens, 0.9) AS p90_tokens,
             |  quantile_cont(n_tokens, 0.99) AS p99_tokens
             |FROM t GROUP BY lang_bucket""".stripMargin)),

    // Gopher-style heuristic quality rules (Rae et al. 2021 §A1.1, adapted
    // word-level for single-line docs): word count bounds, mean word
    // length, alphabetic-word fraction, stopword presence, symbol density.
    // One stateless codegen'd projection — the rules run inside the scan's
    // WholeStageCodegen span, so at 100 TB this is I/O-bound, not CPU-bound.
    // scoring projection shared with the streaming quality router
    // (graft.quality.TextRules) — the in-flight gate and this batch audit
    // apply byte-identical policy.
    Q("gopher_rules",
      (s, dir) => graft.quality.TextRules
        .withGopherColumns(docs(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("frac_alpha"), col("stopword_hits"), col("symbol_ratio"),
          col("keep")),
      Some(s"""WITH $gopherSql
             |SELECT doc_id, n_words, mean_word_len, frac_alpha,
             |  stopword_hits, symbol_ratio, keep
             |FROM gopher""".stripMargin)),

    // per-document unigram word entropy (gibberish / repetition proxy):
    // H = log2(n) - (1/n)·Σ tf·log2(tf). The Σ folds over a SORTED term
    // list sequentially (aggregate over array_sort), so the double sum is
    // order-deterministic and bit-identical to the oracle's list_sum —
    // a plain double SUM() would combine partials in shuffle order.
    // entropy folds over per-doc DISTINCT tf VALUES, not the vocabulary:
    // log2(tf) depends only on tf, so Σ tf·log2(tf) = Σ_{distinct tf}
    // c·tf·log2(tf) with c = how many terms share that tf. Each term of the
    // outer sum is one float expression over ints (order-free), and the
    // outer fold is over a tf-sorted list of ≤ ~40 entries per doc — the
    // prior form list-aggregated the whole per-doc VOCABULARY, which is
    // exact but O(corpus tokens) of aggregate state (DuckDB's list agg
    // cannot spill it: OOM at sf10's 500k docs).
    Q("word_entropy",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id", "tf")
        .agg(count(lit(1)).as("c"))
        .withColumn("contrib", col("c") * (col("tf") * log2(col("tf"))))
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("c")).as("n"), sum("c").as("n_unique"),
          collect_list(struct(col("tf"), col("contrib"))).as("lst"))
        .select(col("doc_id"),
          col("n").cast("long").as("n_tokens"),
          col("n_unique").cast("long").as("n_unique"),
          round(log2(col("n")) -
            expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.contrib)") /
            col("n"), 4).as("entropy")),
      Some("""WITH terms AS (
             |  SELECT doc_id, u.w
             |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws
             |        FROM documents), UNNEST(ws) AS u(w)
             |  WHERE length(u.w) > 0),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM terms GROUP BY doc_id, w),
             |tfc AS (
             |  SELECT doc_id, tf, count(*) AS c, count(*) * (tf * log2(tf)) AS contrib
             |  FROM tf GROUP BY doc_id, tf),
             |agg AS (
             |  SELECT doc_id, sum(tf * c) AS n, sum(c) AS n_unique,
             |    list(contrib ORDER BY tf) AS contribs
             |  FROM tfc GROUP BY doc_id)
             |SELECT doc_id, cast(n AS BIGINT) AS n_tokens,
             |  cast(n_unique AS BIGINT) AS n_unique,
             |  round(log2(n) - list_sum(contribs) / n, 4) AS entropy
             |FROM agg""".stripMargin)),

    // cross-document boilerplate detection: word-3-grams appearing in many
    // DISTINCT documents (headers, footers, license blurbs at corpus
    // scale). Per-doc grams dedup BEFORE the global count (array_distinct
    // pre-explode), so the aggregate counts documents, not occurrences,
    // and map-side combine collapses each partition to its vocabulary.
    // ITERATIVE BPE TRAINING, 5 merges (extends the single-step
    // `bpe_merges` candidate scan to the real training loop): the word
    // corpus is held as separator-joined symbol strings ("|h|e|r|e|"),
    // each round (1) counts adjacent symbol pairs weighted by word
    // frequency, (2) takes the max-count pair (lexicographic tiebreak),
    // (3) merges it EVERYWHERE via literal string replace — whose
    // left-to-right non-overlapping semantics are exactly BPE's greedy
    // merge, and identical in Spark and DuckDB ("|a|a|a|" → "|aa|a|").
    // No driver collect: the winning pair is a 1-row broadcast cross
    // join; per-round cost is one explode + one bounded aggregate over
    // DISTINCT words (frequencies carry multiplicity), lineage truncated
    // per round. Words containing the separator are excluded up front.
    // Output: the 5 (step, pair, weighted count) merge rules — the
    // actual tokenizer artifact.
    Q("bpe_train_merges",
      (s, dir) => {
        val rounds = 5
        var words = docs(s, dir)
          .select(explode(split(col("text"), "\\s+")).as("w"))
          .filter(length(col("w")) > 0 && !col("w").contains("|"))
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .select(concat(lit("|"), concat_ws("|",
            expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
            lit("|")).as("s"), col("freq"))
          .localCheckpoint()
        var rules = Seq.empty[DataFrame]
        for (step <- 1 to rounds) {
          // sequence(1, 0) DESCENDS in Spark — single-symbol words must
          // short-circuit to an empty pair list
          val top1 = words
            .select(col("freq"), explode(expr(
              """CASE WHEN size(filter(split(s, '\\|'), t -> t <> '')) < 2
                |  THEN array()
                |  ELSE transform(sequence(1, size(filter(split(s, '\\|'), t -> t <> '')) - 1),
                |    i -> concat(element_at(filter(split(s, '\\|'), t -> t <> ''), i),
                |                '|',
                |                element_at(filter(split(s, '\\|'), t -> t <> ''), i + 1)))
                |  END""".stripMargin)).as("pair"))
            .groupBy("pair").agg(sum(col("freq")).as("n"))
            .orderBy(col("n").desc, col("pair").asc).limit(1)
          rules = rules :+ top1.withColumn("step", lit(step))
          words = words.crossJoin(broadcast(top1.select(col("pair").as("__p"))))
            .select(expr(
              "replace(s, '|' || __p || '|', '|' || replace(__p, '|', '') || '|')")
              .as("s"), col("freq"))
            .localCheckpoint()
        }
        rules.reduce(_ unionByName _)
          .select(col("step"), col("pair").as("merge_rule"), col("n"))
      },
      Some {
        val stepsSql = (1 to 5).map { k =>
          val prev = s"w${k - 1}"
          s"""p$k AS MATERIALIZED (
             |  SELECT pair, cast(sum(freq) AS BIGINT) AS n FROM (
             |    SELECT u.pair, freq FROM $prev,
             |      UNNEST(list_transform(range(1, len(list_filter(
             |        string_split(s, '|'), t -> t <> ''))),
             |        i -> list_filter(string_split(s, '|'), t -> t <> '')[i] || '|' || list_filter(string_split(s, '|'), t -> t <> '')[i + 1]))
             |      AS u(pair))
             |  GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT 1),
             |w$k AS MATERIALIZED (
             |  SELECT replace(s, '|' || p.pair || '|',
             |    '|' || replace(p.pair, '|', '') || '|') AS s, freq
             |  FROM $prev, p$k p)""".stripMargin
        }.mkString(",\n")
        s"""WITH w0 AS MATERIALIZED (
           |  SELECT '|' || array_to_string(list_transform(
           |      range(1, length(w) + 1), i -> w[i:i]), '|') || '|' AS s,
           |    cast(count(*) AS BIGINT) AS freq
           |  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
           |        FROM documents)
           |  WHERE length(w) > 0 AND NOT contains(w, '|')
           |  GROUP BY w),
           |$stepsSql
           |SELECT * FROM (
           |  ${(1 to 5).map(k =>
               s"SELECT $k AS step, pair AS merge_rule, n FROM p$k")
               .mkString("\n  UNION ALL\n  ")})""".stripMargin
      }),

    // the ENCODE-side readout of the BPE trainer: corpus token count
    // after each merge round — the compression curve that justifies a
    // vocabulary (monotone decreasing by exactly the winning pair's
    // count). Same round chain as bpe_train_merges; one bounded
    // aggregate per round, nothing collected.
    Q("bpe_compression_curve",
      (s, dir) => {
        val rounds = 5
        var words = docs(s, dir)
          .select(explode(split(col("text"), "\\s+")).as("w"))
          .filter(length(col("w")) > 0 && !col("w").contains("|"))
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .select(concat(lit("|"), concat_ws("|",
            expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
            lit("|")).as("s"), col("freq"))
          .localCheckpoint()
        def tokCount(w: DataFrame, step: Int): DataFrame =
          w.agg(sum(col("freq") *
            expr("size(filter(split(s, '\\\\|'), t -> t <> ''))")).as("corpus_tokens"))
            .withColumn("step", lit(step))
        var curve = Seq(tokCount(words, 0))
        for (step <- 1 to rounds) {
          val top1 = words
            .select(col("freq"), explode(expr(
              """CASE WHEN size(filter(split(s, '\\|'), t -> t <> '')) < 2
                |  THEN array()
                |  ELSE transform(sequence(1, size(filter(split(s, '\\|'), t -> t <> '')) - 1),
                |    i -> concat(element_at(filter(split(s, '\\|'), t -> t <> ''), i),
                |                '|',
                |                element_at(filter(split(s, '\\|'), t -> t <> ''), i + 1)))
                |  END""".stripMargin)).as("pair"))
            .groupBy("pair").agg(sum(col("freq")).as("n"))
            .orderBy(col("n").desc, col("pair").asc).limit(1)
          words = words.crossJoin(broadcast(top1.select(col("pair").as("__p"))))
            .select(expr(
              "replace(s, '|' || __p || '|', '|' || replace(__p, '|', '') || '|')")
              .as("s"), col("freq"))
            .localCheckpoint()
          curve = curve :+ tokCount(words, step)
        }
        curve.reduce(_ unionByName _).select(col("step"), col("corpus_tokens"))
      },
      Some {
        val stepsSql = (1 to 5).map { k =>
          val prev = s"w${k - 1}"
          s"""p$k AS MATERIALIZED (
             |  SELECT pair, sum(freq) AS n FROM (
             |    SELECT u.pair, freq FROM $prev,
             |      UNNEST(list_transform(range(1, len(list_filter(
             |        string_split(s, '|'), t -> t <> ''))),
             |        i -> list_filter(string_split(s, '|'), t -> t <> '')[i] || '|' || list_filter(string_split(s, '|'), t -> t <> '')[i + 1]))
             |      AS u(pair))
             |  GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT 1),
             |w$k AS MATERIALIZED (
             |  SELECT replace(s, '|' || p.pair || '|',
             |    '|' || replace(p.pair, '|', '') || '|') AS s, freq
             |  FROM $prev, p$k p)""".stripMargin
        }.mkString(",\n")
        s"""WITH w0 AS MATERIALIZED (
           |  SELECT '|' || array_to_string(list_transform(
           |      range(1, length(w) + 1), i -> w[i:i]), '|') || '|' AS s,
           |    cast(count(*) AS BIGINT) AS freq
           |  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
           |        FROM documents)
           |  WHERE length(w) > 0 AND NOT contains(w, '|')
           |  GROUP BY w),
           |$stepsSql
           |SELECT * FROM (
           |  ${(0 to 5).map(k =>
               s"SELECT $k AS step, cast((SELECT sum(freq * len(list_filter(string_split(s, '|'), t -> t <> ''))) FROM w$k) AS BIGINT) AS corpus_tokens")
               .mkString("\n  UNION ALL\n  ")})""".stripMargin
      }),

    // the native ngrams GENERATOR (expr/NGramsGenerator.scala — the third
    // Catalyst extension kind after scalar exprs and the MA aggregate),
    // driven through its SQL registration: LATERAL VIEW ngrams(text, 3)
    // replaces the transform(sequence(...))+explode composition with one
    // generate loop, no intermediate array-of-arrays. Top-20 corpus
    // trigrams with a deterministic tiebreak.
    Q("ngram_generator_topk",
      (s, dir) => {
        graft.GraftExtensions.register(s)
        docs(s, dir).createOrReplaceTempView("graft_ng_docs")
        s.sql("""SELECT g.ngram, count(*) AS n
                |FROM graft_ng_docs
                |LATERAL VIEW ngrams(text, 3) g AS pos, ngram
                |GROUP BY 1
                |ORDER BY n DESC, ngram
                |LIMIT 20""".stripMargin)
      },
      Some("""WITH w AS (
             |  SELECT regexp_split_to_array(trim(text), '\s+') AS ws
             |  FROM documents),
             |g AS (
             |  SELECT unnest(list_transform(range(1, len(ws) - 1),
             |    i -> array_to_string(ws[i:i+2], ' '))) AS ngram
             |  FROM w WHERE len(ws) >= 3)
             |SELECT ngram, cast(count(*) AS BIGINT) AS n
             |FROM g GROUP BY 1
             |ORDER BY n DESC, ngram LIMIT 20""".stripMargin)),

    Q("boilerplate_ngrams",
      (s, dir) => docs(s, dir)
        .withColumn("words", split(col("text"), "\\s+"))
        .select(col("doc_id"), explode(array_distinct(expr(shinglesExpr))).as("shingle"))
        .groupBy("shingle")
        .agg(count(lit(1)).as("doc_freq"), min(col("doc_id")).as("first_doc_id"))
        .filter(col("doc_freq") >= 4),
      Some(s"""WITH w AS (
              |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS words
              |  FROM documents),
              |shl AS (SELECT doc_id, $shinglesSqlDuck AS shs FROM w),
              |sh0 AS (SELECT DISTINCT doc_id, u.shingle FROM shl, UNNEST(shs) AS u(shingle))
              |SELECT shingle, cast(count(*) AS BIGINT) AS doc_freq,
              |  min(doc_id) AS first_doc_id
              |FROM sh0 GROUP BY shingle HAVING count(*) >= 4""".stripMargin)),

    // Bloom-filter incremental dedup: the membership pre-filter a NEW batch
    // runs against the existing corpus before any expensive verify. The
    // "bloom" is the distinct set of k=3 positions (h1 + i·h2 mod 4096)
    // of each corpus fingerprint — at scale it collapses to an m-bit
    // bitmap broadcast to every executor (m/8 bytes; here the position
    // SET keeps the query engine-comparable). Emits the false-positive
    // accounting (bloom hit without an exact match) that sizes m and k.
    Q("bloom_dedup",
      (s, dir) => {
        val m = 4096
        val h = docs(s, dir)
          .select(col("doc_id"),
            md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
          .select(col("doc_id"), col("fp"),
            conv(substring(col("fp"), 1, 8), 16, 10).cast("long").as("h1"),
            conv(substring(col("fp"), 9, 8), 16, 10).cast("long").as("h2"))
        def positions(df: DataFrame) = df.select(col("doc_id"),
          explode(array((0 until 3).map(i =>
            (col("h1") + lit(i.toLong) * col("h2")) % m): _*)).as("pos"))
        val corpus = h.filter(col("doc_id") % 5 =!= 0)
        val incoming = h.filter(col("doc_id") % 5 === 0)
        val corpusBits = positions(corpus).select("pos").distinct()
        val incPos = positions(incoming).distinct()
        val stat = incPos
          .join(broadcast(corpusBits.withColumn("__hit", lit(1))), Seq("pos"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_pos"), count(col("__hit")).as("n_hit"))
        val exact = corpus.select(col("fp")).distinct().withColumn("__ex", lit(1))
        incoming
          .join(stat, Seq("doc_id"))
          .join(broadcast(exact), Seq("fp"), "left")
          .select(col("doc_id"),
            (col("n_hit") === col("n_pos")).as("bloom_hit"),
            col("__ex").isNotNull.as("exact_dup"),
            (col("n_hit") === col("n_pos") && col("__ex").isNull).as("false_positive"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
             |  FROM documents),
             |h AS (
             |  SELECT doc_id, fp,
             |    cast(('0x' || substr(fp, 1, 8)) AS BIGINT) AS h1,
             |    cast(('0x' || substr(fp, 9, 8)) AS BIGINT) AS h2
             |  FROM f),
             |p AS (
             |  SELECT doc_id, (h1 + i.i * h2) % 4096 AS pos
             |  FROM h, range(0, 3) AS i(i)),
             |corpus_bits AS (SELECT DISTINCT pos FROM p WHERE doc_id % 5 <> 0),
             |inc AS (SELECT DISTINCT doc_id, pos FROM p WHERE doc_id % 5 = 0),
             |stat AS (
             |  SELECT i.doc_id, count(*) AS n_pos, count(cb.pos) AS n_hit
             |  FROM inc i LEFT JOIN corpus_bits cb ON cb.pos = i.pos
             |  GROUP BY i.doc_id),
             |ex AS (SELECT DISTINCT fp FROM h WHERE doc_id % 5 <> 0)
             |SELECT h.doc_id,
             |  s.n_hit = s.n_pos AS bloom_hit,
             |  ex.fp IS NOT NULL AS exact_dup,
             |  (s.n_hit = s.n_pos AND ex.fp IS NULL) AS false_positive
             |FROM h JOIN stat s ON s.doc_id = h.doc_id
             |LEFT JOIN ex ON ex.fp = h.fp
             |WHERE h.doc_id % 5 = 0""".stripMargin)),

    // deterministic stratified sampling: an exact per-stratum quota (40
    // docs per language) drawn by hash order, so the sample is reproducible
    // across runs and engines. One row_number window per stratum — the
    // shuffle is by lang only; at 100 TB swap the exact window for a
    // per-stratum hash THRESHOLD (like mixture_sample) once quotas are
    // large enough that ±1% quota error is acceptable.
    Q("stratified_sample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(concat(lit("strat:"), col("doc_id").cast("string"))).asc,
            col("doc_id").asc)
        docs(s, dir).select(col("doc_id"), col("lang"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 40)
      },
      Some("""SELECT doc_id, lang, cast(rk AS BIGINT) AS rk FROM (
             |  SELECT doc_id, lang,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY md5('strat:' || cast(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 40""".stripMargin)),

    // BM25 top-10 retrieval (Robertson/Lucene form, k1=1.2 b=0.75): the
    // corpus-side pass is the same two partial-aggregating groupBys as
    // tfidf_keywords (per-doc tf, vocab-sized df); the query set is a
    // literal table, so df is semi-joined down to query terms and BOTH
    // query-side tables broadcast — the only shuffles at 100 TB are the
    // tf/dl aggregations. Per-(query,doc) term contributions fold over a
    // SORTED term list so the double sum is order-deterministic; scores
    // round to 4 decimals before ranking (libm ln jitter), ties break by
    // doc_id.
    Q("bm25_topk",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val qpairs = Seq(
          1L -> "table", 1L -> "scan", 1L -> "join",
          2L -> "stream", 2L -> "window", 2L -> "agg",
          3L -> "hash", 3L -> "merge", 3L -> "sort")
        val qterms = qpairs.toDF("query_id", "term")
        val terms = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("term"))
          .filter(length(col("term")) > 0)
        // doc length needs EVERY token; tf/df only need QUERY-term tokens —
        // filtering before the (doc, term) aggregation keeps the corpus-wide
        // exchange down to |Q|-term occurrences (the full tf table would be
        // the dominant shuffle at scale, then dropped on the next join)
        val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val qtoks = terms.filter(col("term").isin(qpairs.map(_._2).distinct: _*))
        val tf = qtoks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val nDocs = docs(s, dir).count()
        // exact long sum / long count over the dl table — deterministic,
        // and the denominator is docs WITH ≥1 token (a whitespace-only doc
        // has no dl row), mirroring the oracle's sum(dl)/count(*) FROM dl
        val dlTot = dl.agg(sum(col("dl")).as("s"), count(lit(1)).as("c")).head()
        val avgdl = dlTot.getLong(0).toDouble / dlTot.getLong(1)
        // df = docs containing the term; tf is already query-term-only
        val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val contrib = tf
          .join(broadcast(qterms), Seq("term"))
          .join(broadcast(dfq), Seq("term"))
          .join(dl, Seq("doc_id"))
          .select(col("query_id"), col("doc_id"), col("term"),
            (log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
              (col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / lit(avgdl))))
              .as("c"))
        val scored = contrib.groupBy("query_id", "doc_id")
          .agg(collect_list(struct(col("term"), col("c"))).as("lst"))
          .select(col("query_id"), col("doc_id"),
            round(expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.c)"), 4)
              .as("score"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id").asc)
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
      },
      Some("""WITH q(query_id, term) AS (VALUES
             |    (1, 'table'), (1, 'scan'), (1, 'join'),
             |    (2, 'stream'), (2, 'window'), (2, 'agg'),
             |    (3, 'hash'), (3, 'merge'), (3, 'sort')),
             |terms AS (
             |  SELECT doc_id, u.term
             |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws
             |        FROM documents), UNNEST(ws) AS u(term)
             |  WHERE length(u.term) > 0),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
             |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |ad AS (SELECT cast(sum(dl) AS double) / count(*) AS avgdl FROM dl),
             |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |contrib AS (
             |  SELECT q.query_id, tf.doc_id, tf.term,
             |    ln((n.n_docs - dfr.df + 0.5) / (dfr.df + 0.5) + 1.0) *
             |      (tf.tf * 2.2) /
             |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / ad.avgdl)) AS c
             |  FROM tf JOIN q ON q.term = tf.term
             |  JOIN dfr ON dfr.term = tf.term
             |  JOIN dl ON dl.doc_id = tf.doc_id, n, ad),
             |scored AS (
             |  SELECT query_id, doc_id,
             |    round(list_sum(list(c ORDER BY term)), 4) AS score
             |  FROM contrib GROUP BY query_id, doc_id),
             |ranked AS (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
             |SELECT cast(query_id AS BIGINT) AS query_id, doc_id, score,
             |  cast(rank AS BIGINT) AS rank
             |FROM ranked WHERE rank <= 10""".stripMargin)),

    // corpus-unigram-LM perplexity scoring (the CCNet quality signal): one
    // vocab-sized corpus frequency table (broadcast), per-doc cross-entropy
    // H = -(1/n)·Σ tf·log2(cf/N) folded over a SORTED term list for an
    // order-deterministic double sum, then head/middle/tail buckets on
    // fixed thresholds. At 100 TB the LM table is built once and reused
    // across datasets; thresholds come from a calibration percentile pass.
    Q("unigram_perplexity",
      (s, dir) => {
        val terms = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
        val corpus = terms.groupBy("w").agg(count(lit(1)).as("cf"))
        val total = terms.count()
        val tf = terms.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        tf.join(broadcast(corpus), Seq("w"))
          .select(col("doc_id"), col("tf"),
            struct(col("w"), (col("tf") * log2(col("cf") / lit(total.toDouble))).as("c")).as("e"))
          .groupBy("doc_id")
          .agg(sum("tf").as("n"), collect_list(col("e")).as("lst"))
          .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
            round(-expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.c)") /
              col("n"), 4).as("cross_entropy"))
          .withColumn("bucket",
            when(col("cross_entropy") < 4.905, "head")
              .when(col("cross_entropy") < 4.911, "middle")
              .otherwise("tail"))
      },
      Some("""WITH terms AS (
             |  SELECT doc_id, u.w
             |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws
             |        FROM documents), UNNEST(ws) AS u(w)
             |  WHERE length(u.w) > 0),
             |corpus AS (SELECT w, count(*) AS cf FROM terms GROUP BY w),
             |tot AS (SELECT count(*) AS n FROM terms),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM terms GROUP BY doc_id, w),
             |agg AS (
             |  SELECT tf.doc_id, sum(tf.tf) AS n,
             |    list(tf.tf * log2(c.cf / t.n) ORDER BY tf.w) AS cs
             |  FROM tf JOIN corpus c ON c.w = tf.w, tot t
             |  GROUP BY tf.doc_id),
             |h AS (
             |  SELECT doc_id, cast(n AS BIGINT) AS n_tokens,
             |    round(-list_sum(cs) / n, 4) AS cross_entropy
             |  FROM agg)
             |SELECT *,
             |  CASE WHEN cross_entropy < 4.905 THEN 'head'
             |       WHEN cross_entropy < 4.911 THEN 'middle'
             |       ELSE 'tail' END AS bucket
             |FROM h""".stripMargin)),

    // exact-substring dedup at word-5-gram granularity (the suffix-array
    // scheme of RefinedWeb/"Deduplicating Training Data Makes LMs Better",
    // approximated span-wise so it stays a join + aggregate): a span is a
    // duplicate if the SAME 5-gram first appeared in a lower doc_id. The
    // gram→first-doc table is vocab-scale (NOT broadcast — equi-join, both
    // sides shuffle-partitioned by gram); per-doc accounting is one
    // partial-aggregating groupBy.
    Q("dup_span_removal",
      (s, dir) => {
        // Grams shuffle as 16-byte md5 BINARY, never as raw 5-gram text
        // (~3× fewer shuffle bytes), and the join back is restricted to
        // grams seen in ≥2 DISTINCT docs (min≠max — single-doc grams can
        // never satisfy first_doc < doc_id, and they are the vast
        // majority): the join output is only the duplicated occurrences.
        // n_spans needs no join at all — it is size(words) − 4 exactly.
        val ws = docs(s, dir)
          .withColumn("words",
            expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)"))
          .filter(size(col("words")) >= 5)
        val grams = ws.select(col("doc_id"),
          explode(expr(
            "transform(sequence(0, size(words) - 5), i -> unhex(md5(concat_ws(' ', slice(words, i + 1, 5)))))"))
            .as("h"))
        val dupFirst = grams.groupBy("h")
          .agg(min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .filter(col("first_doc") =!= col("last_doc")).select("h", "first_doc")
        val dups = grams.join(dupFirst, Seq("h"))
          .filter(col("first_doc") < col("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
        ws.select(col("doc_id"), (size(col("words")) - 4).cast("long").as("n_spans"))
          .join(dups, Seq("doc_id"), "left")
          .withColumn("dup_spans", coalesce(col("dup_spans"), lit(0L)))
          .select(col("doc_id"), col("n_spans"), col("dup_spans"),
            round(col("dup_spans").cast("double") / col("n_spans"), 4).as("dup_frac"),
            (col("dup_spans").cast("double") / col("n_spans") <= 0.5).as("keep"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             |                             x -> length(x) > 0) AS words
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, array_to_string(words[i+1:i+5], ' ') AS gram
             |  FROM w, UNNEST(range(0, greatest(len(words) - 4, 0))) AS u(i)),
             |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
             |d AS (
             |  SELECT g.doc_id, count(*) AS n_spans,
             |    sum(CASE WHEN f.first_doc < g.doc_id THEN 1 ELSE 0 END) AS dup_spans
             |  FROM g JOIN f USING (gram) GROUP BY g.doc_id)
             |SELECT doc_id, cast(n_spans AS BIGINT) AS n_spans,
             |  cast(dup_spans AS BIGINT) AS dup_spans,
             |  round(cast(dup_spans AS double) / n_spans, 4) AS dup_frac,
             |  cast(dup_spans AS double) / n_spans <= 0.5 AS keep
             |FROM d""".stripMargin)),

    // mixture reweighting (DoReMi-style uniform-target variant): per-source
    // token shares and the resampling weight that would equalize them. One
    // source-count-sized aggregate; the total and source count are exact
    // integer scalars so every double division is deterministic.
    Q("source_mix_weights",
      (s, dir) => {
        val per = docs(s, dir)
          .select(col("source"),
            size(split(col("text"), "\\s+")).cast("long").as("toks"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        val agg = per.agg(sum(col("n_tokens")), count(lit(1))).head()
        val total = agg.getLong(0); val nSrc = agg.getLong(1)
        per.select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / lit(total.toDouble), 6).as("token_share"),
          round(lit(1.0 / nSrc) /
            (col("n_tokens").cast("double") / lit(total.toDouble)), 4).as("weight"))
      },
      Some("""WITH per AS (
             |  SELECT source, count(*) AS n_docs,
             |    sum(len(regexp_split_to_array(text, '\s+'))) AS n_tokens
             |  FROM documents GROUP BY source),
             |tot AS (SELECT cast(sum(n_tokens) AS double) AS total,
             |               count(*) AS n_src FROM per)
             |SELECT source, cast(n_docs AS BIGINT) AS n_docs,
             |  cast(n_tokens AS BIGINT) AS n_tokens,
             |  round(n_tokens / t.total, 6) AS token_share,
             |  round((1.0 / t.n_src) / (n_tokens / t.total), 4) AS weight
             |FROM per, tot t""".stripMargin)),

    // temperature-scaled source sampling (multilingual-LM mixture shaping):
    // w_s ∝ p_s^α with α = 0.7 — upsamples low-resource sources relative to
    // their natural share, the standard alternative to the uniform-target
    // reweighting of source_mix_weights. Both scalar denominators (corpus
    // total, Σ p^α over sources) ride 1-row broadcasts over the
    // #sources-row frame; nothing driver-side, nothing shuffled twice.
    Q("temperature_mix",
      (s, dir) => {
        val per = docs(s, dir).groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
        val tot = per.select(sum(col("n_docs")).cast("double").as("total"))
        val p = per.crossJoin(broadcast(tot))
          .withColumn("p", col("n_docs").cast("double") / col("total"))
          .withColumn("pa", pow(col("p"), lit(0.7)))
        val z = p.select(sum(col("pa")).as("z"))
        p.crossJoin(broadcast(z)).select(col("source"), col("n_docs"),
          round(col("p"), 6).as("doc_share"),
          round(col("pa") / col("z"), 6).as("sample_weight"),
          round((col("pa") / col("z")) / col("p"), 4).as("upsample_factor"))
      },
      Some("""WITH per AS (
             |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
             |tot AS (SELECT cast(sum(n_docs) AS double) AS total FROM per),
             |p AS (SELECT source, n_docs, n_docs / t.total AS p,
             |        pow(n_docs / t.total, 0.7) AS pa FROM per, tot t),
             |z AS (SELECT sum(pa) AS z FROM p)
             |SELECT source, cast(n_docs AS BIGINT) AS n_docs,
             |  round(p, 6) AS doc_share,
             |  round(pa / z.z, 6) AS sample_weight,
             |  round((pa / z.z) / p, 4) AS upsample_factor
             |FROM p, z""".stripMargin)),

    // Naive Bayes language classifier — trained AND scored inside the
    // engine. "Training" a multinomial NB is nothing but distributed
    // counting: one groupBy for per-(lang, word) counts, one for per-lang
    // totals, one distinct for |V| — the model is an aggregate, so it
    // trains in a single pass over 100 TB with map-side combine and no
    // parameter server. Scoring broadcasts the tiny lang-level totals and
    // equi-joins the count table on (lang, word); add-1 smoothing keeps
    // unseen words finite. Scores are rounded to 6 dp BEFORE the argmax so
    // Spark and the oracle sort identical keys (FP sum order differs).
    // Resubstitution fit on the corpus itself — the eval a pipeline runs
    // to sanity-check the labeler before applying it to unlabeled data.
    Q("nb_train_score",
      (s, dir) => {
        val d = docs(s, dir)
        val model = graft.quality.NaiveBayes.train(d)
        graft.quality.NaiveBayes.score(d, model)
          .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("pred_lang"),
            (col("pred_lang") === col("lang")).as("correct"), col("log_score"))
      },
      Some("""WITH dw AS (
             |  SELECT doc_id, lang, u.w
             |  FROM documents, UNNEST(regexp_split_to_array(text, '\s+')) AS u(w)
             |  WHERE length(u.w) > 0),
             |doc_word AS (SELECT doc_id, w, count(*) AS n_dw FROM dw GROUP BY doc_id, w),
             |cc AS (SELECT lang AS l, w, count(*) AS c_lw FROM dw GROUP BY lang, w),
             |ct AS (SELECT lang AS l, count(*) AS t_l FROM dw GROUP BY lang),
             |v AS (SELECT count(DISTINCT w) AS v FROM dw),
             |pri AS (SELECT lang AS l,
             |          ln(count(*)) - ln((SELECT count(*) FROM documents)) AS log_prior
             |        FROM documents GROUP BY lang),
             |scored AS (
             |  SELECT d.doc_id, ct.l,
             |    round(any_value(pri.log_prior) + sum(d.n_dw *
             |      (ln(coalesce(cc.c_lw, 0) + 1) - ln(ct.t_l + (SELECT v FROM v)))), 6)
             |      AS score_r
             |  FROM doc_word d
             |  CROSS JOIN ct
             |  JOIN pri ON pri.l = ct.l
             |  LEFT JOIN cc ON cc.l = ct.l AND cc.w = d.w
             |  GROUP BY d.doc_id, ct.l)
             |SELECT s.doc_id, doc.lang, s.l AS pred_lang,
             |  (s.l = doc.lang) AS correct, s.score_r AS log_score
             |FROM scored s JOIN documents doc ON doc.doc_id = s.doc_id
             |QUALIFY ROW_NUMBER() OVER (PARTITION BY s.doc_id
             |  ORDER BY s.score_r DESC, s.l ASC) = 1""".stripMargin)),

    // sketch-accuracy eval: per LSH candidate pair, the MinHash ESTIMATE of
    // Jaccard (fraction of equal signature components) next to the exact
    // shingle-set Jaccard — the calibration a pipeline runs before trusting
    // signature length k=8 at corpus scale. Signatures are re-derived for
    // candidate MEMBERS only (left_semi before the shingle explode), so the
    // verify never re-shingles the whole corpus; every arithmetic step is
    // integer-exact, no rounding needed before the final abs-error.
    Q("minhash_estimate",
      (s, dir) => {
        val cands = lshCandidates(s, dir)
        val members = cands.select("doc_id")
          .union(cands.select(col("doc_id_2").as("doc_id"))).distinct()
        val sig = minhashSignatures(s, dir, Some(members))
        val sig2 = sig.select(col("doc_id").as("doc_id_2"), col("sig").as("sig_2"))
        val d = docs(s, dir)
          .join(broadcast(members), Seq("doc_id"), "left_semi")
          .withColumn("words", split(col("text"), "\\s+"))
          .select(col("doc_id"), array_distinct(expr(shinglesExpr)).as("sh"))
        val d2 = d.select(col("doc_id").as("doc_id_2"), col("sh").as("sh2"))
        cands
          .join(sig, Seq("doc_id")).join(sig2, Seq("doc_id_2"))
          .join(d, Seq("doc_id")).join(d2, Seq("doc_id_2"))
          .select(col("doc_id"), col("doc_id_2"),
            (size(expr("filter(zip_with(split(sig, '\\\\|'), split(sig_2, '\\\\|'), (a, b) -> a = b), x -> x)"))
              .cast("double") / 8.0).as("est_jaccard"),
            (size(array_intersect(col("sh"), col("sh2"))).cast("double") /
              size(array_union(col("sh"), col("sh2")))).as("jaccard"))
          .withColumn("abs_err", round(abs(col("est_jaccard") - col("jaccard")), 4))
      },
      Some(s"""WITH $lshCandSql,
              |shd AS (SELECT doc_id, list(shingle) AS sh FROM sh0 GROUP BY doc_id),
              |est AS (
              |  SELECT c.doc_id, c.doc_id_2,
              |    cast(len(list_filter(list_zip(
              |        regexp_split_to_array(a.sig, '\\|'),
              |        regexp_split_to_array(b.sig, '\\|')),
              |      s -> s[1] = s[2])) AS double) / 8.0 AS est_jaccard
              |  FROM cands c JOIN sig a ON a.doc_id = c.doc_id
              |               JOIN sig b ON b.doc_id = c.doc_id_2)
              |SELECT e.doc_id, e.doc_id_2, e.est_jaccard,
              |  cast(len(list_intersect(x.sh, y.sh)) AS double) /
              |    len(list_distinct(x.sh || y.sh)) AS jaccard,
              |  round(abs(e.est_jaccard -
              |    cast(len(list_intersect(x.sh, y.sh)) AS double) /
              |      len(list_distinct(x.sh || y.sh))), 4) AS abs_err
              |FROM est e JOIN shd x ON x.doc_id = e.doc_id
              |           JOIN shd y ON y.doc_id = e.doc_id_2""".stripMargin)),

    // incremental near-dup: a NEW batch (doc_id % 5 = 0) checked against the
    // stored corpus signature index — the production shape for a corpus that
    // grows continuously: corpus signatures/bands are a table built once
    // (here re-derived; at scale they are read back), only the incoming
    // batch is shingled+hashed fresh, and candidate generation is an
    // equi-join of incoming bands against INDEX bands. Hot index buckets
    // (> cap members) are skipped like the batch operator — they are
    // boilerplate, not dup candidates. Shingle sets for the exact-Jaccard
    // verify are re-derived for pair members only.
    Q("lsh_incremental",
      (s, dir) => {
        val sig = minhashSignatures(s, dir)
        val corpusB = bandsOf(sig.filter(col("doc_id") % 5 =!= 0))
        val incB = bandsOf(sig.filter(col("doc_id") % 5 === 0))
        val okCorpus = corpusB.join(
          corpusB.groupBy("band", "bucket").count()
            .filter(col("count") <= MaxBucketSize).drop("count"),
          Seq("band", "bucket"), "left_semi")
        val cands = incB.join(
          okCorpus.select(col("doc_id").as("corpus_doc_id"), col("band"), col("bucket")),
          Seq("band", "bucket"))
          .select(col("doc_id"), col("corpus_doc_id")).distinct()
        val members = cands.select("doc_id")
          .union(cands.select(col("corpus_doc_id").as("doc_id"))).distinct()
        val d = docs(s, dir).join(broadcast(members), Seq("doc_id"), "left_semi")
          .withColumn("words", split(col("text"), "\\s+"))
          .select(col("doc_id"), array_distinct(expr(shinglesExpr)).as("sh"))
        val d2 = d.select(col("doc_id").as("corpus_doc_id"), col("sh").as("sh2"))
        cands.join(d, Seq("doc_id")).join(d2, Seq("corpus_doc_id"))
          .select(col("doc_id"), col("corpus_doc_id"),
            (size(array_intersect(col("sh"), col("sh2"))).cast("double") /
              size(array_union(col("sh"), col("sh2")))).as("jaccard"))
          .withColumn("is_dup", col("jaccard") >= 0.7)
      },
      Some(s"""WITH $lshCandSql,
              |corpus_b AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
              |inc_b AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
              |ok_corpus AS (
              |  SELECT b.* FROM corpus_b b SEMI JOIN (
              |    SELECT band, bucket FROM corpus_b GROUP BY band, bucket
              |    HAVING count(*) <= 100) s
              |  ON b.band = s.band AND b.bucket = s.bucket),
              |cands2 AS (
              |  SELECT DISTINCT i.doc_id, c.doc_id AS corpus_doc_id
              |  FROM inc_b i JOIN ok_corpus c
              |    ON i.band = c.band AND i.bucket = c.bucket),
              |shd AS (SELECT doc_id, list(shingle) AS sh FROM sh0 GROUP BY doc_id)
              |SELECT c.doc_id, c.corpus_doc_id,
              |  cast(len(list_intersect(x.sh, y.sh)) AS double) /
              |    len(list_distinct(x.sh || y.sh)) AS jaccard,
              |  cast(len(list_intersect(x.sh, y.sh)) AS double) /
              |    len(list_distinct(x.sh || y.sh)) >= 0.7 AS is_dup
              |FROM cands2 c JOIN shd x ON x.doc_id = c.doc_id
              |              JOIN shd y ON y.doc_id = c.corpus_doc_id""".stripMargin)),

    // fasttext-style linear quality classifier over HASHED bag-of-words
    // features (64 buckets, frequency-normalized), sigmoid output. The
    // weight vector is a deterministic literal here; a trained model would
    // swap its weights in — the SHAPE is the production one: stateless
    // hashed featurization (no vocabulary table at all), one per-doc
    // aggregation, a sorted fold for an order-deterministic double sum.
    Q("quality_classifier",
      (s, dir) => classifierScored(s, dir)
        .withColumn("keep", col("score") >= 0.5),
      Some(s"""WITH $classifierScoreSql
             |SELECT doc_id, score, score >= 0.5 AS keep
             |FROM clf_scored""".stripMargin)),

    // threshold sweep of the hashed-feature classifier against the Gopher
    // heuristic labels: precision/recall/F1 at 9 operating points — the
    // calibration table that picks a production threshold before the
    // classifier gates a 100 TB corpus. One scan computes scores, one the
    // labels; the 9-row threshold spine rides a broadcast and the sweep is
    // a single partial aggregation (every (threshold, doc) pair reduces
    // map-side). Shares the score definition with quality_classifier and
    // the label definition with gopher_rules/corpus_pipeline — a sweep
    // over a DIFFERENT model than the one deployed would be meaningless.
    Q("classifier_pr_curve",
      (s, dir) => {
        val scored = classifierScored(s, dir)
        val labels = graft.quality.TextRules
          .withGopherColumns(docs(s, dir), "text")
          .select(col("doc_id"), col("keep").as("label"))
        val spine = s.range(1, 10).select((col("id") / 10.0).as("threshold"))
        scored.join(labels, Seq("doc_id"))
          .crossJoin(broadcast(spine))
          .groupBy("threshold")
          .agg(
            sum(when(col("score") >= col("threshold") && col("label"), 1L)
              .otherwise(0L)).as("tp"),
            sum(when(col("score") >= col("threshold") && !col("label"), 1L)
              .otherwise(0L)).as("fp"),
            sum(when(col("score") < col("threshold") && col("label"), 1L)
              .otherwise(0L)).as("fn"))
          .select(col("threshold"), col("tp"), col("fp"), col("fn"),
            round(try_divide(col("tp").cast("double"),
              (col("tp") + col("fp")).cast("double")), 4).as("precision"),
            round(try_divide(col("tp").cast("double"),
              (col("tp") + col("fn")).cast("double")), 4).as("recall"),
            round(try_divide((lit(2L) * col("tp")).cast("double"),
              (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")), 4)
              .as("f1"))
      },
      Some(s"""WITH $classifierScoreSql,
             |gw AS (
             |  SELECT doc_id, coalesce(text, '') AS text,
             |    list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
             |                x -> length(x) > 0) AS words
             |  FROM documents),
             |gm AS (
             |  SELECT doc_id,
             |    cast(len(words) AS BIGINT) AS n_words,
             |    round(cast(list_sum(list_transform(words, x -> length(x))) AS double)
             |          / len(words), 4) AS mean_word_len,
             |    round(cast(len(list_filter(words,
             |          x -> regexp_full_match(x, '[A-Za-z]+'))) AS double)
             |          / len(words), 4) AS frac_alpha,
             |    cast(len(list_filter(words,
             |          x -> lower(x) IN ('the','a','and','of','to','in'))) AS BIGINT)
             |      AS stopword_hits,
             |    round(cast(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS double)
             |          / len(words), 4) AS symbol_ratio
             |  FROM gw),
             |lab AS (
             |  SELECT doc_id,
             |    coalesce(n_words BETWEEN 10 AND 100000
             |      AND mean_word_len BETWEEN 2 AND 10 AND frac_alpha >= 0.8
             |      AND stopword_hits >= 2 AND symbol_ratio <= 0.1, false) AS label
             |  FROM gm),
             |th AS (SELECT cast(i AS DOUBLE) / 10.0 AS threshold
             |       FROM range(1, 10) t(i)),
             |j AS (
             |  SELECT th.threshold, s.score, l.label
             |  FROM clf_scored s JOIN lab l USING (doc_id) CROSS JOIN th),
             |cm AS (
             |  SELECT threshold,
             |    cast(sum(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    cast(sum(CASE WHEN score >= threshold AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    cast(sum(CASE WHEN score < threshold AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn
             |  FROM j GROUP BY threshold)
             |SELECT threshold, tp, fp, fn,
             |  round(tp / nullif(tp + fp, 0), 4) AS precision,
             |  round(tp / nullif(tp + fn, 0), 4) AS recall,
             |  round(2 * tp / nullif(2 * tp + fp + fn, 0), 4) AS f1
             |FROM cm""".stripMargin)),

    // exact-substring dedup REWRITE — the other half of dup_span_removal's
    // accounting: remove every word position covered by a 5-gram whose
    // identical text first appeared in a lower doc_id, and emit the
    // reassembled clean text (the actual corpus transformation of
    // "Deduplicating Training Data Makes LMs Better", span-approximated).
    // Gram→first-doc is an equi-join shuffled by gram hash (vocab-scale,
    // never broadcast); one collect_set of duplicated START positions per
    // doc builds the keep mask (coverage expands in-array), and the
    // rewrite itself is a per-row array filter — no shuffle after the
    // doc-level aggregate.
    // Same-doc repeats of a gram inside its OWN first document are kept
    // (within-doc repetition is repetition_score's axis, not dedup's).
    Q("dup_span_rewrite",
      (s, dir) => {
        val ws = docs(s, dir)
          .select(col("doc_id"),
            expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)").as("words"))
        // grams shuffle as 16-byte md5 BINARY (not raw 5-gram text), the
        // join back is restricted to grams in ≥2 distinct docs (min≠max
        // — the only ones that can be covered), and coverage expands
        // pos → [pos, pos+4] INSIDE the per-doc array after collecting
        // duplicated start positions, so the groupBy shuffles 1× the
        // duplicated occurrences instead of exploding 5× position rows.
        val grams = ws.filter(size(col("words")) >= 5)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(0, size(words) - 5),
              |  i -> struct(i AS pos, unhex(md5(concat_ws(' ', slice(words, i + 1, 5)))) AS h))"""
              .stripMargin)).as("g"))
          .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
        val dupFirst = grams.groupBy("h")
          .agg(min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .filter(col("first_doc") =!= col("last_doc")).select("h", "first_doc")
        val covered = grams.join(dupFirst, Seq("h"))
          .filter(col("first_doc") < col("doc_id"))
          .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
          .select(col("doc_id"), expr(
            "array_distinct(flatten(transform(starts, p -> sequence(p, p + 4))))").as("cov"))
        ws.join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"),
            size(col("words")).cast("long").as("n_words"),
            coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"),
            concat_ws(" ", expr(
              """filter(transform(words,
                |  (w, i) -> IF(cov IS NOT NULL AND array_contains(cov, i), NULL, w)),
                |  x -> x IS NOT NULL)""".stripMargin)).as("clean_text"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             |                             x -> length(x) > 0) AS words
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, i AS pos, array_to_string(words[i+1:i+5], ' ') AS gram
             |  FROM w, UNNEST(range(0, greatest(len(words) - 4, 0))) AS u(i)),
             |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
             |cov AS (
             |  SELECT DISTINCT g.doc_id, c.p
             |  FROM g JOIN f USING (gram), UNNEST(range(g.pos, g.pos + 5)) AS c(p)
             |  WHERE f.first_doc < g.doc_id),
             |wp AS (
             |  SELECT doc_id, words[i + 1] AS word, i AS p
             |  FROM w, UNNEST(range(0, len(words))) AS u(i)),
             |kept AS (
             |  SELECT wp.doc_id, wp.word, wp.p
             |  FROM wp LEFT JOIN cov ON cov.doc_id = wp.doc_id AND cov.p = wp.p
             |  WHERE cov.p IS NULL),
             |agg AS (
             |  SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS clean_text
             |  FROM kept GROUP BY doc_id),
             |nrem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
             |SELECT w.doc_id, cast(len(w.words) AS BIGINT) AS n_words,
             |  cast(coalesce(n.n_removed, 0) AS BIGINT) AS n_removed,
             |  coalesce(a.clean_text, '') AS clean_text
             |FROM w LEFT JOIN agg a ON a.doc_id = w.doc_id
             |       LEFT JOIN nrem n ON n.doc_id = w.doc_id""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for LMs via
    // Importance Resampling"): hashed-unigram bag features; each doc's log
    // importance weight is its log-likelihood ratio under the TARGET unigram
    // distribution (the lang='en' slice standing in for the target domain)
    // vs the RAW corpus distribution, Laplace-smoothed. Both distributions
    // live in ONE 64-row aggregate (conditional count — a single shuffle,
    // broadcast back regardless of corpus size); the per-doc sum folds in
    // bucket-sorted order so the double result is engine-deterministic.
    Q("dsir_weights",
      (s, dir) => {
        val B = 64L
        val terms = docs(s, dir)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
          .select(col("doc_id"), col("lang"),
            (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % B).as("bucket"))
        val dist = terms.groupBy("bucket").agg(
          count(lit(1)).as("raw_cnt"),
          count(when(col("lang") === "en", lit(1))).as("tgt_cnt"))
        val tot = dist.agg(sum("raw_cnt"), sum("tgt_cnt")).head()
        val (rawTot, tgtTot) = (tot.getLong(0), tot.getLong(1))
        val contrib = (col("cnt").cast("double") *
          (log((col("tgt_cnt") + 1L).cast("double") / lit((tgtTot + B).toDouble)) -
           log((col("raw_cnt") + 1L).cast("double") / lit((rawTot + B).toDouble)))).as("c")
        terms.groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
          .join(broadcast(dist), Seq("bucket"))
          .select(col("doc_id"), col("cnt"), struct(col("bucket"), contrib).as("e"))
          .groupBy("doc_id")
          .agg(sum("cnt").as("n"), collect_list(col("e")).as("lst"))
          .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
            round(expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.c)"),
              4).as("log_weight"))
          .withColumn("keep", col("log_weight") > 0.0)
      },
      Some("""WITH terms AS (
             |  SELECT doc_id, lang,
             |    cast(('0x' || substr(md5(u.w), 1, 8)) AS BIGINT) % 64 AS bucket
             |  FROM documents, UNNEST(regexp_split_to_array(text, '\s+')) AS u(w)
             |  WHERE length(u.w) > 0),
             |dist AS (
             |  SELECT bucket, count(*) AS raw_cnt,
             |    count(*) FILTER (WHERE lang = 'en') AS tgt_cnt
             |  FROM terms GROUP BY bucket),
             |tot AS (SELECT sum(raw_cnt) AS raw_tot, sum(tgt_cnt) AS tgt_tot FROM dist),
             |bb AS (SELECT doc_id, bucket, count(*) AS cnt
             |       FROM terms GROUP BY doc_id, bucket),
             |agg AS (
             |  SELECT bb.doc_id, sum(bb.cnt) AS n,
             |    list(cast(bb.cnt AS double) *
             |         (ln(cast(d.tgt_cnt + 1 AS double) / cast(t.tgt_tot + 64 AS double))
             |        - ln(cast(d.raw_cnt + 1 AS double) / cast(t.raw_tot + 64 AS double)))
             |         ORDER BY bb.bucket) AS cs
             |  FROM bb JOIN dist d ON d.bucket = bb.bucket, tot t
             |  GROUP BY bb.doc_id)
             |SELECT doc_id, cast(n AS BIGINT) AS n_tokens,
             |  round(list_sum(cs), 4) AS log_weight,
             |  round(list_sum(cs), 4) > 0 AS keep
             |FROM agg""".stripMargin)),

    // END-TO-END PIPELINE FUNNEL: the composition a production corpus run
    // actually executes — exact dedup (keep lowest doc_id per content
    // hash), then the shared Gopher gate (graft.quality.TextRules, the
    // SAME projection the streaming router applies), then PII scrub on the
    // survivors — accounted per source as a funnel. ONE shuffle for the
    // dedup first-doc join (equi-join on content hash, corpus-scale — not
    // broadcast) and ONE for the final 20-group aggregate; every quality/
    // scrub column is a stateless projection fused into the scan, and all
    // funnel sums are integers (no float-order hazard).
    Q("corpus_pipeline",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipv4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
        val phone = "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b"
        val d = docs(s, dir).withColumn("h", md5(col("text")))
        val first = d.groupBy("h").agg(min(col("doc_id")).as("keep_id"))
        val scrubbed = regexp_replace(regexp_replace(regexp_replace(col("text"),
          email, "<EMAIL>"), ipv4, "<IP>"), phone, "<PHONE>")
        graft.quality.TextRules.withGopherColumns(d.join(first, Seq("h")), "text")
          .withColumn("surv_dedup", col("doc_id") === col("keep_id"))
          .withColumn("q", col("surv_dedup") && col("keep"))
          .withColumn("has_pii",
            regexp_count(col("text"), lit(email)) +
              regexp_count(col("text"), lit(ipv4)) +
              regexp_count(col("text"), lit(phone)) > 0)
          .withColumn("toks_out",
            size(filter(split(scrubbed, "\\s+"), w => length(w) > 0)).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_in"),
            sum(when(col("surv_dedup"), 1L).otherwise(0L)).as("n_after_dedup"),
            sum(when(col("q"), 1L).otherwise(0L)).as("n_after_quality"),
            sum(when(col("q") && col("has_pii"), 1L).otherwise(0L)).as("n_pii_docs"),
            sum(when(col("q"), col("toks_out")).otherwise(0L)).as("n_tokens_out"))
      },
      Some("""WITH d AS (SELECT doc_id, source, text, md5(text) AS h FROM documents),
             |f AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY h),
             |w AS (SELECT d.*, f.keep_id,
             |        list_filter(regexp_split_to_array(text, '\s+'),
             |                    x -> length(x) > 0) AS words
             |      FROM d JOIN f USING (h)),
             |m AS (SELECT doc_id, source, text, keep_id,
             |        len(words) AS n_words,
             |        round(cast(list_sum(list_transform(words, x -> length(x))) AS double)
             |              / len(words), 4) AS mean_word_len,
             |        round(cast(len(list_filter(words,
             |              x -> regexp_full_match(x, '[A-Za-z]+'))) AS double)
             |              / len(words), 4) AS frac_alpha,
             |        len(list_filter(words,
             |              x -> lower(x) IN ('the','a','and','of','to','in'))) AS stopword_hits,
             |        round(cast(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS double)
             |              / len(words), 4) AS symbol_ratio
             |      FROM w),
             |st AS (SELECT source,
             |        doc_id = keep_id AS surv_dedup,
             |        (doc_id = keep_id AND n_words BETWEEN 10 AND 100000
             |         AND mean_word_len BETWEEN 2 AND 10 AND frac_alpha >= 0.8
             |         AND stopword_hits >= 2 AND symbol_ratio <= 0.1) AS q,
             |        (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |         + len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))
             |         + len(regexp_extract_all(text, '\b\d{3}[- .]\d{3}[- .]\d{4}\b'))) > 0 AS has_pii,
             |        len(list_filter(regexp_split_to_array(
             |          regexp_replace(regexp_replace(regexp_replace(text,
             |            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |            '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             |            '\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g'), '\s+'),
             |          x -> length(x) > 0)) AS toks_out
             |      FROM m)
             |SELECT source, count(*) AS n_in,
             |  cast(sum(CASE WHEN surv_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup,
             |  cast(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
             |  cast(sum(CASE WHEN q AND has_pii THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
             |  cast(sum(CASE WHEN q THEN toks_out ELSE 0 END) AS BIGINT) AS n_tokens_out
             |FROM st GROUP BY source""".stripMargin)),

    // weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // key = ln(u)/w with u ~ Uniform(0,1] derived deterministically from
    // md5(doc_id) and w = n_chars; the top-k keys ARE a w-weighted sample
    // without replacement. orderBy+limit compiles to TakeOrderedAndProject
    // — per-partition top-k heaps merged on the driver, never a global
    // sort shuffle — so the op is one scan at any corpus size.
    Q("weighted_sample",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          graft.ops.Sampling.aresKey(col("doc_id"), col("n_chars")).as("sample_key"))
        .orderBy(col("sample_key").desc, col("doc_id").asc)
        .limit(20),
      Some("""SELECT doc_id, source, n_chars,
             |  round(ln((cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8)) AS BIGINT) + 1.0)
             |        / 4294967296.0) / n_chars, 10) AS sample_key
             |FROM documents
             |ORDER BY sample_key DESC, doc_id LIMIT 20""".stripMargin)),

    // bigram-LM cross-entropy with unigram interpolation — the next-order
    // refinement of unigram_perplexity (CCNet's filtering signal uses a
    // 5-gram LM; same plan shape, deeper tables): P(w2|w1) is the
    // Jelinek–Mercer mix 0.75·c(w1,w2)/c(w1·) + 0.25·c(w2)/N. The bigram
    // count table is vocab²-scale — equi-joined (shuffled on its key),
    // NEVER broadcast; the per-doc Σ tf·log2 P folds over a sorted term
    // list so the double sum is engine-deterministic.
    Q("bigram_perplexity",
      (s, dir) => {
        val ws = docs(s, dir)
          .select(col("doc_id"),
            expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)").as("words"))
        val bi = ws.filter(size(col("words")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(words) - 2), i -> struct(words[i] AS w1, words[i + 1] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val uni = ws.select(explode(col("words")).as("w2"))
          .groupBy("w2").agg(count(lit(1)).as("cw"))
        val n = uni.agg(sum(col("cw"))).head().getLong(0)
        val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
        val p = lit(0.75) * (col("c2").cast("double") / col("c1")) +
          lit(0.25) * (col("cw").cast("double") / lit(n.toDouble))
        bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
          .join(c2, Seq("w1", "w2")).join(c1, Seq("w1")).join(uni, Seq("w2"))
          .select(col("doc_id"), col("tf"),
            struct(col("w1"), col("w2"), (col("tf") * log2(p)).as("c")).as("e"))
          .groupBy("doc_id")
          .agg(sum("tf").as("n"), collect_list(col("e")).as("lst"))
          .select(col("doc_id"), col("n").cast("long").as("n_bigrams"),
            round(-expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.c)") /
              col("n"), 4).as("cross_entropy"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             |                             x -> length(x) > 0) AS words
             |  FROM documents),
             |bi AS (
             |  SELECT doc_id, words[i + 1] AS w1, words[i + 2] AS w2
             |  FROM w, UNNEST(range(0, greatest(len(words) - 1, 0))) AS u(i)),
             |uni AS (SELECT u.w2, count(*) AS cw
             |        FROM w, UNNEST(words) AS u(w2) GROUP BY u.w2),
             |tot AS (SELECT cast(sum(cw) AS double) AS n FROM uni),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
             |agg AS (
             |  SELECT tf.doc_id, sum(tf.tf) AS n,
             |    list(tf.tf * log2(0.75 * (cast(c2.c2 AS double) / c1.c1)
             |                    + 0.25 * (cast(un.cw AS double) / t.n))
             |         ORDER BY tf.w1, tf.w2) AS cs
             |  FROM (SELECT doc_id, w1, w2, count(*) AS tf
             |        FROM bi GROUP BY doc_id, w1, w2) tf
             |  JOIN c2 ON c2.w1 = tf.w1 AND c2.w2 = tf.w2
             |  JOIN c1 ON c1.w1 = tf.w1
             |  JOIN uni un ON un.w2 = tf.w2, tot t
             |  GROUP BY tf.doc_id)
             |SELECT doc_id, cast(n AS BIGINT) AS n_bigrams,
             |  round(-list_sum(cs) / n, 4) AS cross_entropy
             |FROM agg""".stripMargin)),

    // skew-resistant dimension join, driver-verified: `lang` is the
    // corpus's skewed key (en ≈ 43% of docs — at 100 TB that one key IS
    // the straggler task), so the per-lang dimension joins through
    // Ops.saltedJoin: the hot key's probe rows scatter across 8 salted
    // buckets while the dimension replicates 8×. The oracle is the PLAIN
    // join — proving the salted plan is semantically invisible.
    Q("skew_join_salted",
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("lang"))
        val dim = docs(s, dir).groupBy("lang")
          .agg(count(lit(1)).as("lang_docs"))
        graft.ops.Ops.saltedJoin(d, dim, Seq("lang"), buckets = 8)
          .select(col("doc_id"), col("lang"), col("lang_docs"))
      },
      Some("""WITH dim AS (SELECT lang, count(*) AS lang_docs
             |            FROM documents GROUP BY lang)
             |SELECT d.doc_id, d.lang, dim.lang_docs
             |FROM documents d JOIN dim USING (lang)""".stripMargin)),

    // sketch-based cardinality: per source, exact distinct docs next to
    // the HyperLogLog++ estimate (rsd 1%). At 100 TB the exact path is a
    // full shuffle of every distinct key; the sketch is a few KB per
    // partition merged map-side — the only viable shape — so the query
    // ASSERTS the sketch lands within 5% of truth as an oracle-checked
    // column (the estimate itself is engine-specific and never compared).
    Q("cardinality_sketch",
      (s, dir) => {
        // exact and sketch in SEPARATE aggregations: mixed
        // distinct + non-distinct aggs make Catalyst thread the partial
        // HLL (rsd 0.01 = 1.6k long registers) through the per-(source,
        // doc_id) dedup expansion — every distinct KEY would carry a
        // 13 KB sketch into the shuffle. Split, each agg is its natural
        // shape: the sketch merges map-side (one per partition × source),
        // the exact path shuffles only the distinct keys; the 20-row
        // results broadcast-join.
        val d = docs(s, dir)
        val exact = d.groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_exact"))
        val approx = d.groupBy("source")
          .agg(approx_count_distinct(col("doc_id"), rsd = 0.01).as("n_approx"))
        exact.join(approx, Seq("source"))
          .select(col("source"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact")).cast("double") <=
              lit(0.05) * col("n_exact")).as("approx_within_5pct"))
      },
      Some("""SELECT source, count(DISTINCT doc_id) AS n_exact,
             |  true AS approx_within_5pct
             |FROM documents GROUP BY source""".stripMargin)),

    // per-source distribution drift: KL(P_source ‖ P_corpus) over unigram
    // distributions — the mixture-monitoring signal that catches a source
    // whose content shifted between crawls. P_corpus ⊇ every source's
    // vocabulary, so the divergence is finite by construction. Scale
    // shape: two partial-aggregating groupBys (per-source tf, corpus tf)
    // joined on the word — vocab-scale, equi-join, NEVER broadcast; the
    // Σ P ln(P/Q) folds over a per-source SORTED word list so the double
    // sum is engine-deterministic (same idiom as word_entropy).
    Q("unigram_drift",
      (s, dir) => {
        val terms = docs(s, dir)
          .select(col("source"), explode(split(col("text"), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
        val srcTf = terms.groupBy("source", "w").agg(count(lit(1)).as("tf"))
        val srcTot = srcTf.groupBy("source").agg(sum(col("tf")).as("n_src"))
        val corpTf = srcTf.groupBy("w").agg(sum(col("tf")).as("cf"))
        val corpTot = terms.count()
        srcTf.join(corpTf, Seq("w")).join(srcTot, Seq("source"))
          .select(col("source"), col("n_src"), col("w"),
            ((col("tf") / col("n_src")) *
              log((col("tf") / col("n_src")) /
                (col("cf") / lit(corpTot.toDouble)))).as("c"))
          .groupBy("source", "n_src")
          .agg(collect_list(struct(col("w"), col("c"))).as("lst"))
          .select(col("source"), col("n_src").as("n_tokens"),
            round(expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.c)"), 6)
              .as("kl_nats"))
      },
      Some("""WITH terms AS (
             |  SELECT source, u.w
             |  FROM (SELECT source, regexp_split_to_array(text, '\s+') AS ws
             |        FROM documents), UNNEST(ws) AS u(w)
             |  WHERE length(u.w) > 0),
             |src_tf AS (SELECT source, w, count(*) AS tf
             |           FROM terms GROUP BY source, w),
             |src_tot AS (SELECT source, sum(tf) AS n_src
             |            FROM src_tf GROUP BY source),
             |corp_tf AS (SELECT w, sum(tf) AS cf FROM src_tf GROUP BY w),
             |corp_tot AS (SELECT count(*) AS n FROM terms),
             |contrib AS (
             |  SELECT s.source, t.n_src, s.w,
             |    (s.tf / t.n_src) *
             |      ln((s.tf / t.n_src) / (c.cf / cast(ct.n AS double))) AS c
             |  FROM src_tf s
             |  JOIN corp_tf c ON c.w = s.w
             |  JOIN src_tot t ON t.source = s.source, corp_tot ct)
             |SELECT source, cast(n_src AS BIGINT) AS n_tokens,
             |  round(list_sum(list(c ORDER BY w)), 6) AS kl_nats
             |FROM contrib GROUP BY source, n_src""".stripMargin)),

    // cross-source vocabulary overlap via theta sketches: pairwise shingle-
    // set intersection/union/Jaccard between every pair of sources — the
    // corpus-composition signal (which crawls share boilerplate, which are
    // near-disjoint). Scale shape: the EXACT pairwise overlap needs a
    // vocab-scale self-join emitting a row per shared term per pair — at
    // 100 TB with hundreds of sources that join is the job. The sketch
    // path is one partial-aggregating groupBy producing |S| fixed-size
    // (lgK=12 ⇒ ≤4096-entry) theta sketches; all |S|²/2 intersections and
    // unions then run on those tiny blobs in a broadcast pair join
    // (BNLJ over |S| rows, never a shuffle). Unlike HLL, theta supports
    // INTERSECTION — this is the operator HLL cardinality can't express.
    // Theta estimates are deterministic functions of the input SET (kept-
    // minimum hash values; merge-order-independent), so the within-
    // tolerance booleans are stable: measured worst error at sf0.1
    // (≈10k vocab/source, sampling mode) is 4.6% inter / 1.7% union
    // against 10% / 5% asserted; at sf0.01 the sketches are exact.
    // mergeable top-k: per-source frequent-items sketch states
    // (DataSketches, via approx_top_k_accumulate) combined into the corpus
    // top-k WITHOUT re-reading tokens — the rollup-friendly sibling of
    // `hll_sketch_rollup` for the frequency dimension (hot tokens / hot
    // domains per source, re-aggregated to any window over persisted
    // states). Below the tracked-items capacity the sketch is exact by
    // construction (no evictions), so the combined estimates are asserted
    // EQUAL to the exact counts here; above capacity the same plan returns
    // εN-bounded estimates — the 100 TB shape is unchanged: one partial
    // aggregate to |S| fixed-size states, one tiny combine.
    Q("topk_sketch_rollup",
      (s, dir) => {
        val k = 25
        val terms = docs(s, dir)
          .select(col("source"), explode(split(col("text"), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
        val states = terms.groupBy("source")
          .agg(expr("approx_top_k_accumulate(w, 1024)").as("st"))
        val est = states.agg(expr("approx_top_k_combine(st)").as("st"))
          .select(explode(expr(s"approx_top_k_estimate(st, $k)")).as("e"))
          .select(col("e.item").as("w"), col("e.count").as("n_est"))
        val exact = terms.groupBy("w").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("w")).limit(k)
        exact.join(est, Seq("w"), "left")
          .select(col("w"), col("n_exact"),
            coalesce(col("n_est") === col("n_exact"), lit(false)).as("est_exact"))
      },
      Some("""WITH terms AS (
             |  SELECT u.w
             |  FROM (SELECT regexp_split_to_array(text, '\s+') AS ws
             |        FROM documents), UNNEST(ws) AS u(w)
             |  WHERE length(u.w) > 0),
             |c AS (SELECT w, count(*) AS n_exact FROM terms GROUP BY w)
             |SELECT w, n_exact, true AS est_exact
             |FROM c ORDER BY n_exact DESC, w LIMIT 25""".stripMargin)),

    Q("theta_overlap",
      (s, dir) => {
        val grams = docs(s, dir)
          .withColumn("words", split(col("text"), "\\s+"))
          .select(col("source"), explode(array_distinct(expr(shinglesExpr))).as("sh"))
          .distinct()
        val sk = grams.groupBy("source")
          .agg(expr("theta_sketch_agg(sh)").as("sk"), count(lit(1)).as("nv"))
        val est = sk.select(col("source").as("src_a"), col("sk").as("sk_a"),
            col("nv").as("nv_a"))
          .join(sk.select(col("source").as("src_b"), col("sk").as("sk_b"),
            col("nv").as("nv_b")), col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"), col("nv_a"), col("nv_b"),
            expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").as("est_inter"),
            expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").as("est_union"))
        val exact = grams.withColumnRenamed("source", "src_a")
          .join(grams.withColumnRenamed("source", "src_b"), Seq("sh"))
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_inter_exact"))
        val union = col("nv_a") + col("nv_b") - col("n_inter_exact")
        est.join(exact, Seq("src_a", "src_b"))
          .select(col("src_a"), col("src_b"), col("n_inter_exact"),
            union.as("n_union_exact"),
            round(col("n_inter_exact").cast("double") / union, 6).as("jaccard"),
            (abs(col("est_inter") - col("n_inter_exact")) <=
              lit(0.10) * col("n_inter_exact")).as("inter_est_ok"),
            (abs(col("est_union") - union) <= lit(0.05) * union).as("union_est_ok"))
      },
      Some(s"""WITH w AS (
              |  SELECT source, regexp_split_to_array(text, '\\s+') AS words
              |  FROM documents),
              |shl AS (SELECT source, $shinglesSqlDuck AS shs FROM w),
              |g AS (SELECT DISTINCT source, sh
              |      FROM (SELECT source, unnest(shs) AS sh FROM shl)),
              |nv AS (SELECT source, count(*) AS nv FROM g GROUP BY source),
              |inter AS (
              |  SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_inter_exact
              |  FROM g x JOIN g y ON x.sh = y.sh AND x.source < y.source
              |  GROUP BY 1, 2)
              |SELECT i.src_a, i.src_b, i.n_inter_exact,
              |  na.nv + nb.nv - i.n_inter_exact AS n_union_exact,
              |  round(i.n_inter_exact / (na.nv + nb.nv - i.n_inter_exact), 6) AS jaccard,
              |  true AS inter_est_ok, true AS union_est_ok
              |FROM inter i
              |JOIN nv na ON na.source = i.src_a
              |JOIN nv nb ON nb.source = i.src_b""".stripMargin)),

    // Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; Chen &
    // Goodman 1998 §2.7) — the production smoothing the Jelinek–Mercer
    // mix in `bigram_perplexity` approximates: absolute discount
    // D = 0.75 on the bigram count, mass redistributed via CONTINUATION
    // counts (in how many distinct contexts does w2 appear), not raw
    // unigram frequency:
    //   P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·)
    //            + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    // Every model table is a shuffled groupBy aggregate over the bigram
    // frame (vocab²-scale, never broadcast, never collected); the
    // per-doc Σ tf·log2 P folds over a SORTED term list so the double
    // sum is engine-deterministic.
    Q("kneser_ney_bigram",
      (s, dir) => {
        val ws = docs(s, dir)
          .select(col("doc_id"),
            expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)").as("words"))
        val bi = ws.filter(size(col("words")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(words) - 2), i -> struct(words[i] AS w1, words[i + 1] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        // the vocab²-scale bigram count table feeds FOUR consumers (c1,
        // back, the n1pTotal action, the join) — checkpoint IT (small
        // next to the corpus), while the map-side-combined aggregates
        // over the raw bigram frame stay as-is (guide §2.3: aggregate
        // before you shuffle; §1.2: don't re-run the c2 chain per
        // consumer)
        val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
          .localCheckpoint()
        val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"),
          count(lit(1)).as("n1p_fwd"))
        val back = c2.groupBy("w2").agg(count(lit(1)).as("n1p_back"))
        val n1pTotal = c2.count()
        val d = lit(0.75)
        val p = greatest(col("c2") - d, lit(0.0)) / col("c1") +
          d * col("n1p_fwd") / col("c1") *
            (col("n1p_back") / lit(n1pTotal.toDouble))
        bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
          .join(c2, Seq("w1", "w2")).join(c1, Seq("w1")).join(back, Seq("w2"))
          .select(col("doc_id"), col("tf"),
            struct(col("w1"), col("w2"), (col("tf") * log2(p)).as("c")).as("e"))
          .groupBy("doc_id")
          .agg(sum("tf").as("n"), collect_list(col("e")).as("lst"))
          .select(col("doc_id"), col("n").cast("long").as("n_bigrams"),
            round(-expr("aggregate(array_sort(lst), cast(0 AS double), (a, x) -> a + x.c)") /
              col("n"), 4).as("kn_cross_entropy"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             |                             x -> length(x) > 0) AS words
             |  FROM documents),
             |bi AS (
             |  SELECT doc_id, words[i + 1] AS w1, words[i + 2] AS w2
             |  FROM w, UNNEST(range(0, greatest(len(words) - 1, 0))) AS u(i)),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
             |c1 AS (SELECT w1, sum(c2) AS c1, count(*) AS n1p_fwd
             |       FROM c2 GROUP BY w1),
             |back AS (SELECT w2, count(*) AS n1p_back FROM c2 GROUP BY w2),
             |tot AS (SELECT cast(count(*) AS double) AS n1p_total FROM c2),
             |agg AS (
             |  SELECT tf.doc_id, sum(tf.tf) AS n,
             |    list(tf.tf * log2(
             |        greatest(cast(c2.c2 AS double) - 0.75, 0.0) / c1.c1
             |        + 0.75 * c1.n1p_fwd / c1.c1 * (back.n1p_back / t.n1p_total))
             |      ORDER BY tf.w1, tf.w2) AS cs
             |  FROM (SELECT doc_id, w1, w2, count(*) AS tf
             |        FROM bi GROUP BY doc_id, w1, w2) tf
             |  JOIN c2 ON c2.w1 = tf.w1 AND c2.w2 = tf.w2
             |  JOIN c1 ON c1.w1 = tf.w1
             |  JOIN back ON back.w2 = tf.w2, tot t
             |  GROUP BY tf.doc_id)
             |SELECT doc_id, cast(n AS BIGINT) AS n_bigrams,
             |  round(-list_sum(cs) / n, 4) AS kn_cross_entropy
             |FROM agg""".stripMargin)),

    // PREFIX-FILTER SET-SIMILARITY SELF-JOIN (the AllPairs/PPJoin family:
    // Bayardo et al. WWW'07, Xiao et al. WWW'08) — EXACT Jaccard ≥ 0.7
    // pairs over distinct-word sets. A different algorithmic contract from
    // minhash_lsh: no false negatives by THEOREM, not by band-count
    // tuning. Sort each doc's tokens by ascending global document
    // frequency (rarest first); any two sets with J ≥ t must share a
    // token inside their first |x| − ⌈t·|x|⌉ + 1 tokens, so candidate
    // generation is an equi-join on prefix tokens — never all-pairs, and
    // the prefix join keys are the RAREST tokens, which keeps per-key
    // fan-out small at 100 TB (stop-word-like keys never enter a prefix).
    // A symmetric size filter (⌊t·max⌋ ≤ min) prunes before the verify
    // join. Every DECISION is integer arithmetic: prefix length uses
    // (7·sz+9) div 10 = ⌈0.7·sz⌉ (never float ceil), the size filter is
    // 10·min ≥ 7·max, the final threshold 10·|∩| ≥ 7·|∪| — parity cannot
    // hinge on float rounding; `jaccard` is a reported measure only.
    // PrefixFilterSpec pins COMPLETENESS against an O(n²) brute force at
    // sf0.001 (parity alone can't prove both engines miss the same pair).
    //
    // EXPLICIT INPUT BOUND (not a silent cap): the synthetic corpus is one
    // ~70%-of-docs template near-clique, so the TRUE pair set grows
    // quadratically with SF (≈600M pairs at sf1) — a property of the
    // data, not the algorithm. The exact join's production seat is the
    // verify stage AFTER blocking (minhash_lsh/dedup_clusters are the
    // corpus-scale front end); this row pins its semantics on the
    // deterministic doc_id < 500 slice (sf0.01's full corpus), identical
    // work at every SF ≥ 0.01, the same fixture-bounding used by the codebook/ANN rows.
    Q("setsim_prefix_join",
      (s, dir) => {
        val t10 = 7 // Jaccard threshold in tenths (0.7)
        val toks = docs(s, dir)
          .filter(col("doc_id") < 500)
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(length(col("term")) >= 3)
          .distinct()
        val df_ = toks.groupBy("term").agg(count(lit(1)).as("df"))
        val ordered = toks.join(df_, Seq("term"))
          .groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("df"), col("term"))))
            .as("ord"))
          .select(col("doc_id"), col("ord"), size(col("ord")).as("sz"))
        val pref = ordered
          .select(col("doc_id"), col("sz"),
            expr(s"slice(ord, 1, sz - (($t10 * sz + 9) div 10) + 1)").as("p"))
          .select(col("doc_id"), col("sz"), explode(col("p")).as("pt"))
          .select(col("doc_id"), col("sz"), col("pt.term").as("term"))
        val pref2 = pref.select(col("term"), col("doc_id").as("doc_id_2"),
          col("sz").as("sz2"))
        val cand = pref.join(pref2, Seq("term"))
          .filter(col("doc_id") < col("doc_id_2") &&
            least(col("sz"), col("sz2")) * 10 >=
              greatest(col("sz"), col("sz2")) * t10)
          .select("doc_id", "doc_id_2").distinct()
        val sets = ordered.select(col("doc_id"),
          expr("transform(ord, x -> x.term)").as("ts"), col("sz"))
        val sets2 = sets.select(col("doc_id").as("doc_id_2"),
          col("ts").as("ts2"), col("sz").as("sz2"))
        cand.join(sets, Seq("doc_id")).join(sets2, Seq("doc_id_2"))
          .select(col("doc_id"), col("doc_id_2"),
            size(array_intersect(col("ts"), col("ts2"))).cast("long")
              .as("n_inter"),
            (col("sz") + col("sz2")).cast("long").as("szsum"))
          .withColumn("n_union", col("szsum") - col("n_inter"))
          .filter(col("n_inter") * 10 >= col("n_union") * t10)
          .select(col("doc_id"), col("doc_id_2"), col("n_inter"),
            col("n_union"),
            round(col("n_inter").cast("double") / col("n_union"), 4)
              .as("jaccard"))
      },
      // Same prefix-filter candidate generation restated relationally
      // (window functions, not array slices) so the oracle stays
      // O(candidates) at every SF — the round-8 sf1 drill killed two
      // quadratic oracles; this one never goes all-pairs. Intersections
      // are computed by an independent token-level join, not list ops.
      Some("""WITH toks AS (
             |  SELECT DISTINCT doc_id, u.term
             |  FROM (SELECT doc_id,
             |          regexp_split_to_array(lower(text), '[^a-z]+') AS ts
             |        FROM documents WHERE doc_id < 500),
             |       UNNEST(ts) AS u(term)
             |  WHERE len(u.term) >= 3),
             |df AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
             |ordered AS (
             |  SELECT t.doc_id, t.term,
             |    row_number() OVER (PARTITION BY t.doc_id
             |                       ORDER BY d.df, t.term) AS pos,
             |    count(*) OVER (PARTITION BY t.doc_id) AS sz
             |  FROM toks t JOIN df d USING (term)),
             |pref AS (SELECT * FROM ordered
             |         WHERE pos <= sz - ((7 * sz + 9) // 10) + 1),
             |cand AS (
             |  SELECT DISTINCT a.doc_id, b.doc_id AS doc_id_2
             |  FROM pref a JOIN pref b
             |    ON a.term = b.term AND a.doc_id < b.doc_id
             |  WHERE least(a.sz, b.sz) * 10 >= greatest(a.sz, b.sz) * 7),
             |inter AS (
             |  SELECT c.doc_id, c.doc_id_2, count(*) AS n_inter
             |  FROM cand c
             |  JOIN toks x ON x.doc_id = c.doc_id
             |  JOIN toks y ON y.doc_id = c.doc_id_2 AND y.term = x.term
             |  GROUP BY 1, 2),
             |sz AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id)
             |SELECT i.doc_id, i.doc_id_2,
             |  cast(i.n_inter AS BIGINT) AS n_inter,
             |  cast(s1.sz + s2.sz - i.n_inter AS BIGINT) AS n_union,
             |  round(cast(i.n_inter AS double)
             |    / (s1.sz + s2.sz - i.n_inter), 4) AS jaccard
             |FROM inter i
             |JOIN sz s1 ON s1.doc_id = i.doc_id
             |JOIN sz s2 ON s2.doc_id = i.doc_id_2
             |WHERE i.n_inter * 10 >= (s1.sz + s2.sz - i.n_inter) * 7""".stripMargin))
  )
}
