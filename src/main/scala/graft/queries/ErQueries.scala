package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{OracleSql => O}

/** ENTITY RESOLUTION / record linkage — the master-data sibling of the
  * dedup suite: instead of near-identical *documents*, near-identical
  * *records* (a CRM customer vs its slightly-mangled import twin) must
  * be blocked, scored, thresholded, clustered and survived into one
  * golden entity. Classic Fellegi–Sunter probabilistic linkage, run
  * entirely as DataFrame ops:
  *
  *   block → candidate pairs (never all-pairs) → per-field agreement
  *   vector → m/u probabilities estimated from the data → per-pair
  *   likelihood ratio → threshold → connected components → survivorship.
  *
  * The fixture plants a deterministic "dirty twin" for every third
  * customer (rec_id −(id+1) in the collision-free negative keyspace,
  * name case/punct-mangled, balance off by one cent) so ground truth is
  * known in closed form and the oracle can label pairs exactly.
  *
  * Determinism note: match weights are LIKELIHOOD RATIOS (products of
  * per-field m/u divisions in a fixed order), not log-weights — IEEE
  * division/multiplication is bit-identical across engines, libm log2 is
  * not. Scale: the name-prefix blocking key bounds BLOCK SIZE to a
  * constant at every SF, so pair fanout is O(n); m/u estimation is one
  * grouped aggregate broadcast back; CC is the shared path-halving
  * GraphOps used by the dedup clusters.
  */
object ErQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** customers ∪ dirty twins of every custkey % 3 == 0: twin id =
    * −(id + 1) (NEGATIVE keyspace — `id + 1e6` collides with real
    * customer keys once custkeys cross 1e6, i.e. at sf≥7; the +1 keeps
    * custkey 0's twin off 0; same hardening as the CDC fixtures), whole
    * name lowercased and '#' → '-' (levenshtein 2 from
    * the original), balance +1 cent, same nation/segment. Ground truth
    * is `id_a + id_b = -1`, impossible for any non-twin pair at any
    * SF (orig+orig sums ≥ 0 and twin+twin ≤ −2). */
  private def records(s: SparkSession, dir: String): DataFrame = {
    val c = rd(s, dir, "customer")
    val orig = c.select(col("c_custkey").as("rec_id"), col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("segment"), lit("crm").as("src"))
    val twin = c.filter(col("c_custkey") % 3 === 0)
      .select(((col("c_custkey") + 1L) * -1L).as("rec_id"),
        translate(lower(col("c_name")), "#", "-").as("name"),
        col("c_nationkey").as("nation"),
        (col("c_acctbal") + 0.01).as("acctbal"),
        col("c_mktsegment").as("segment"), lit("import").as("src"))
    orig.unionByName(twin)
  }

  private val recordsSql =
    """recs AS (
      |  SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nation,
      |    c_acctbal AS acctbal, c_mktsegment AS segment, 'crm' AS src
      |  FROM customer
      |  UNION ALL
      |  SELECT -(c_custkey + 1) AS rec_id,
      |    translate(lower(c_name), '#', '-') AS name, c_nationkey AS nation,
      |    c_acctbal + 0.01 AS acctbal, c_mktsegment AS segment,
      |    'import' AS src
      |  FROM customer WHERE c_custkey % 3 = 0)""".stripMargin

  /** BOUNDED blocking key: the normalized name (lowercase, '#'→'-' — the
    * exact transform the dirty twin applies, so orig and twin normalize
    * IDENTICALLY and always co-block) minus its last character. TPC-H
    * names are a constant prefix + 9 digits, so a block is the ≤10
    * records sharing all but the last digit plus their twins — block
    * size is a CONSTANT (~13) at every SF and total pair count is O(n).
    * The previous (nation, segment) key had FIXED cardinality 125, so
    * block size — and the levenshtein fan-out — grew linearly with the
    * data and the pair count quadratically: ~7e9 pairs at sf10, the
    * classic ER blocking failure. nation/segment instead becomes a
    * SCORING field (agree_loc), which the old scheme couldn't use (it
    * was constant-true within a block). */
  private def blocked(s: SparkSession, dir: String): DataFrame =
    records(s, dir).withColumn("blk",
      expr("substring(translate(lower(name), '#', '-'), 1, length(name) - 1)"))

  private val blockedSql =
    """blk AS (
      |  SELECT r.*, substr(translate(lower(name), '#', '-'), 1,
      |                     length(name) - 1) AS blk
      |  FROM recs r)""".stripMargin

  /** candidate pairs: equi-self-join on the bounded block key, a < b
    * ordering, with per-field agreement flags and the ground-truth label
    * (twin ⟺ ids sum to −1). */
  private def candidatePairs(s: SparkSession, dir: String): DataFrame = {
    val r = blocked(s, dir)
    val a = r.select(col("rec_id").as("id_a"), col("name").as("name_a"),
      col("nation").as("nation_a"), col("acctbal").as("bal_a"),
      col("segment").as("segment_a"), col("blk"))
    val b = r.select(col("rec_id").as("id_b"), col("name").as("name_b"),
      col("nation").as("nation_b"), col("acctbal").as("bal_b"),
      col("segment").as("segment_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (levenshtein(col("name_a"), col("name_b")) <= 2).as("agree_name"),
        (col("nation_a") === col("nation_b") &&
          col("segment_a") === col("segment_b")).as("agree_loc"),
        (abs(col("bal_a") - col("bal_b")) <= 0.02).as("agree_bal"),
        (col("id_a") + col("id_b") === -1L).as("is_match"))
  }

  private val pairsSql =
    s"""$recordsSql,
       |$blockedSql,
       |pairs AS (
       |  SELECT a.rec_id AS id_a, b.rec_id AS id_b,
       |    levenshtein(a.name, b.name) <= 2 AS agree_name,
       |    (a.nation = b.nation AND a.segment = b.segment) AS agree_loc,
       |    abs(a.acctbal - b.acctbal) <= 0.02 AS agree_bal,
       |    a.rec_id + b.rec_id = -1 AS is_match
       |  FROM blk a JOIN blk b
       |    ON a.blk = b.blk AND a.rec_id < b.rec_id)""".stripMargin

  /** 1-row m/u stats + the per-pair likelihood ratio, fixed field order
    * (name, location, balance). The pair frame is cached once
    * (MEMORY_AND_DISK): the blocked self-join + levenshtein kernel is the
    * dominant cost and every consumer reads it at least twice (the m/u
    * aggregate and the scored projection; the entity query adds CC) — in
    * production candidates are a stored table, exactly like the LSH
    * chain's persist (an eager localCheckpoint measured 5× slower — the
    * disk round-trip dwarfs the recompute it saves). Under the old
    * (nation, segment) blocking the cold build was 8.9s at sf0.1; the
    * bounded prefix key cut the pair count ~3× there and makes it O(n)
    * at every SF. */
  /** one persisted copy per (session, sfDir), explicitly tracked so the
    * bench's cold-evict hook can re-price the build (relying on
    * CacheManager plan-dedup shares the data but leaves nothing to evict,
    * so every min-of-N pass would read warm and the dominant build cost
    * would vanish from the round's artifact — the MA-stage lesson). */
  private val pairCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  def evictShared(s: SparkSession): Unit =
    pairCache.keys.filter(_._1 eq s).foreach { k =>
      pairCache.remove(k).foreach(df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () })
    }

  private def scoredPairs(s: SparkSession, dir: String): DataFrame = {
    // one live pair-frame per session: a caller that walks several sfDirs
    // (the test suite does sf0.001→0.01→0.1) would otherwise accumulate
    // persisted blocks for every dir with no release path outside the
    // bench's evictShared hook — unpersist the stale dir's entry first
    pairCache.keys.filter(k => (k._1 eq s) && k._2 != dir).foreach { k =>
      pairCache.remove(k).foreach(df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () })
    }
    val pairs = pairCache.getOrElseUpdate((s, dir), candidatePairs(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val mu = pairs.agg(
      (sum(when(col("is_match") && col("agree_name"), 1L).otherwise(0L))
        .cast("double") / sum(when(col("is_match"), 1L).otherwise(0L)))
        .as("m_name"),
      (sum(when(!col("is_match") && col("agree_name"), 1L).otherwise(0L))
        .cast("double") / sum(when(!col("is_match"), 1L).otherwise(0L)))
        .as("u_name"),
      (sum(when(col("is_match") && col("agree_loc"), 1L).otherwise(0L))
        .cast("double") / sum(when(col("is_match"), 1L).otherwise(0L)))
        .as("m_loc"),
      (sum(when(!col("is_match") && col("agree_loc"), 1L).otherwise(0L))
        .cast("double") / sum(when(!col("is_match"), 1L).otherwise(0L)))
        .as("u_loc"),
      (sum(when(col("is_match") && col("agree_bal"), 1L).otherwise(0L))
        .cast("double") / sum(when(col("is_match"), 1L).otherwise(0L)))
        .as("m_bal"),
      (sum(when(!col("is_match") && col("agree_bal"), 1L).otherwise(0L))
        .cast("double") / sum(when(!col("is_match"), 1L).otherwise(0L)))
        .as("u_bal"))
    def ratio(agree: Column, m: Column, u: Column): Column =
      // u can be 0 in a clean corpus: clamp to 1/N-ish floor exactly as
      // the oracle does, keeping the ratio finite
      when(agree, m / greatest(u, lit(1e-6)))
        .otherwise((lit(1.0) - m) / greatest(lit(1.0) - u, lit(1e-6)))
    pairs.crossJoin(broadcast(mu))
      .select(col("id_a"), col("id_b"), col("agree_name"), col("agree_loc"),
        col("agree_bal"), col("is_match"),
        (ratio(col("agree_name"), col("m_name"), col("u_name")) *
          ratio(col("agree_loc"), col("m_loc"), col("u_loc")) *
          ratio(col("agree_bal"), col("m_bal"), col("u_bal")))
          .as("likelihood_ratio"))
  }

  private val scoredSql =
    s"""$pairsSql,
       |mu AS (
       |  SELECT
       |    cast(sum(CASE WHEN is_match AND agree_name THEN 1 ELSE 0 END)
       |      AS double) / sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS m_name,
       |    cast(sum(CASE WHEN NOT is_match AND agree_name THEN 1 ELSE 0 END)
       |      AS double) / sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS u_name,
       |    cast(sum(CASE WHEN is_match AND agree_loc THEN 1 ELSE 0 END)
       |      AS double) / sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS m_loc,
       |    cast(sum(CASE WHEN NOT is_match AND agree_loc THEN 1 ELSE 0 END)
       |      AS double) / sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS u_loc,
       |    cast(sum(CASE WHEN is_match AND agree_bal THEN 1 ELSE 0 END)
       |      AS double) / sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS m_bal,
       |    cast(sum(CASE WHEN NOT is_match AND agree_bal THEN 1 ELSE 0 END)
       |      AS double) / sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS u_bal
       |  FROM pairs),
       |scored AS (
       |  SELECT p.id_a, p.id_b, p.agree_name, p.agree_loc, p.agree_bal,
       |    p.is_match,
       |    (CASE WHEN p.agree_name THEN mu.m_name / greatest(mu.u_name, 1e-6)
       |          ELSE (1.0 - mu.m_name) / greatest(1.0 - mu.u_name, 1e-6) END)
       |    * (CASE WHEN p.agree_loc THEN mu.m_loc / greatest(mu.u_loc, 1e-6)
       |            ELSE (1.0 - mu.m_loc) / greatest(1.0 - mu.u_loc, 1e-6) END)
       |    * (CASE WHEN p.agree_bal THEN mu.m_bal / greatest(mu.u_bal, 1e-6)
       |            ELSE (1.0 - mu.m_bal) / greatest(1.0 - mu.u_bal, 1e-6) END)
       |      AS likelihood_ratio
       |  FROM pairs p, mu)""".stripMargin

  val all: Seq[Q] = Seq(

    // Blocking diagnostics: the block-SIZE HISTOGRAM and its pair fanout
    // — the number every ER run must look at BEFORE joining (a skewed
    // block is quadratic). Histogram grain keeps the output bounded at
    // any SF (block count is O(n), distinct block sizes stay ~a dozen);
    // the over_cap flag fires at 10k pairs per block, where a production
    // run falls back to a finer key (exactly like the LSH bucket caps in
    // the dedup suite). With the bounded name-prefix key the max block
    // is ~13 records at EVERY SF — the histogram proves it.
    Q("er_blocking",
      (s, dir) => {
        blocked(s, dir)
          .groupBy(col("blk"))
          .agg(count(lit(1)).as("n_records"))
          .groupBy(col("n_records"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(col("n_records") * (col("n_records") - 1) / 2).cast("long")
              .as("n_pairs"),
            max(col("n_records") * (col("n_records") - 1) / 2 > 10000)
              .as("over_cap"))
      },
      Some(s"""WITH $recordsSql,
              |$blockedSql,
              |bs AS (SELECT blk, cast(count(*) AS BIGINT) AS n_records
              |       FROM blk GROUP BY 1)
              |SELECT n_records, cast(count(*) AS BIGINT) AS n_blocks,
              |  cast(sum(n_records * (n_records - 1) // 2) AS BIGINT)
              |    AS n_pairs,
              |  max(n_records * (n_records - 1) // 2 > 10000) AS over_cap
              |FROM bs GROUP BY 1""".stripMargin)),

    // Fellegi–Sunter match weights with m/u estimated FROM the data
    // (agreement rates among labeled matches vs non-matches — here the
    // planted-twin label; in production a clerical sample). One grouped
    // aggregate produces the 1-row m/u table, broadcast back over the
    // pairs; the likelihood ratio multiplies per-field m/u ratios in a
    // fixed order. Summary per (agreement-pattern, decision) cell keeps
    // the output bounded while pinning every distinct weight value.
    Q("er_match_weights",
      (s, dir) => {
        scoredPairs(s, dir)
          .groupBy(col("agree_name"), col("agree_loc"), col("agree_bal"),
            col("is_match"))
          .agg(count(lit(1)).as("n_pairs"),
            round(min(col("likelihood_ratio")), 6).as("weight"),
            max(col("likelihood_ratio") > 100.0).as("decision_link"))
      },
      Some(s"""WITH $scoredSql
              |SELECT agree_name, agree_loc, agree_bal, is_match,
              |  cast(count(*) AS BIGINT) AS n_pairs,
              |  round(min(likelihood_ratio), 6) AS weight,
              |  max(likelihood_ratio > 100.0) AS decision_link
              |FROM scored GROUP BY 1, 2, 3, 4""".stripMargin)),

    // The native codegen'd Jaro–Winkler expression (Spark has no
    // built-in; expr/JaroWinkler.scala, registered as `jaro_winkler`
    // through GraftExtensions) scored over every blocked candidate pair
    // and pinned byte-for-byte against DuckDB's
    // jaro_winkler_similarity — the record-linkage name comparator the
    // levenshtein gate approximates. Summary grain: per (true-label,
    // similarity-band) counts with min/max sims, so every distinct
    // value participates in the hash without a 16k-row dump.
    Q("er_jaro_similarity",
      (s, dir) => {
        val r = blocked(s, dir)
        val a = r.select(col("rec_id").as("id_a"), col("name").as("name_a"),
          col("blk"))
        val b = r.select(col("rec_id").as("id_b"), col("name").as("name_b"),
          col("blk"))
        a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (col("id_a") + col("id_b") === -1L).as("is_match"),
            graft.expr.JaroWinkler.sim(col("name_a"), col("name_b"))
              .as("jw"))
          .groupBy(col("is_match"), floor(col("jw") * 10).cast("int")
            .as("sim_band"))
          .agg(count(lit(1)).as("n_pairs"),
            round(min(col("jw")), 6).as("min_sim"),
            round(max(col("jw")), 6).as("max_sim"))
      },
      Some(s"""WITH $recordsSql,
              |$blockedSql,
              |scored AS (
              |  SELECT a.rec_id AS id_a, b.rec_id AS id_b,
              |    a.rec_id + b.rec_id = -1 AS is_match,
              |    jaro_winkler_similarity(a.name, b.name) AS jw
              |  FROM blk a JOIN blk b
              |    ON a.blk = b.blk AND a.rec_id < b.rec_id)
              |SELECT is_match, cast(floor(jw * 10) AS INT) AS sim_band,
              |  cast(count(*) AS BIGINT) AS n_pairs,
              |  round(min(jw), 6) AS min_sim,
              |  round(max(jw), 6) AS max_sim
              |FROM scored GROUP BY 1, 2""".stripMargin)),

    // SAME-AS LINK: the Data Vault 2.0 construct that lands ER output IN
    // THE VAULT — each over-threshold match becomes a link row between
    // the master and duplicate customer hubs (link hashkey over both
    // business keys, FK hashkeys per side, reference link-loader
    // semantics incl. earliest-row dedup). datavault4dbt users assemble
    // same-as links by hand from the generic link macro; here the ER
    // pipeline FEEDS it: probabilistic matching upstream, auditable
    // insert-only vault structure downstream. Oracle rebuilds the link
    // from the planted-twin closed form through the shared hash SQL.
    Q("same_as_link",
      (s, dir) => {
        implicit val hc: graft.expr.HashConfig = graft.expr.HashConfig()
        val staged = scoredPairs(s, dir)
          .filter(col("likelihood_ratio") > 100.0)
          .select(
            graft.expr.Hashing.hashkey(Seq(col("id_a"), col("id_b")))
              .as("hk_customer_sal_l"),
            graft.expr.Hashing.hashkey(Seq(col("id_a"))).as("hk_master"),
            graft.expr.Hashing.hashkey(Seq(col("id_b"))).as("hk_duplicate"),
            expr("timestamp'2024-06-01 00:00:00'").as(
              graft.expr.SystemColumns.LdtsAlias),
            lit("ER/SameAs").as(graft.expr.SystemColumns.RsrcAlias))
        graft.loaders.LinkLoader.records(
          Seq(graft.loaders.EntitySource(staged, Some("hk_customer_sal_l"),
            Seq("hk_master", "hk_duplicate"))),
          "hk_customer_sal_l", Seq("hk_master", "hk_duplicate"), target = None)
      },
      // derived from the SAME scored pairs + threshold as the query — the
      // planted-twin closed form broke at sf0.1, where one coincidental
      // non-twin pair also clears the likelihood threshold
      Some(s"""WITH $scoredSql,
              |matched AS (
              |  SELECT id_a AS a, id_b AS b FROM scored
              |  WHERE likelihood_ratio > 100.0)
              |SELECT ${O.hashkey("a", "b")} AS hk_customer_sal_l,
              |  ${O.hashkey("a")} AS hk_master,
              |  ${O.hashkey("b")} AS hk_duplicate,
              |  timestamp '2024-06-01 00:00:00' AS ldts,
              |  'ER/SameAs' AS rsrc
              |FROM matched""".stripMargin)),

    // Threshold → entities → GOLDEN RECORD: pairs over the link
    // threshold cluster into entities via the shared path-halving
    // connected components (same GraphOps as the dedup clusters; the
    // planted truth makes components = {original, twin} pairs, so the
    // oracle's min-id closed form is exact), then survivorship picks
    // per-field winners by source priority (crm beats import) and the
    // entity keeps the twin's cent-corrected balance via max — the
    // RelQueries golden_record rules applied at ER-cluster grain.
    Q("er_entities_golden",
      (s, dir) => {
        val matched = scoredPairs(s, dir)
          .filter(col("likelihood_ratio") > 100.0)
          .select(col("id_a"), col("id_b"))
        val cc = graft.ops.GraphOps.connectedComponents(matched, "id_a", "id_b")
        val r = records(s, dir)
        r.join(cc.select(col("node").as("rec_id"), col("component")),
            Seq("rec_id"), "left")
          .withColumn("entity_id", coalesce(col("component"), col("rec_id")))
          .groupBy(col("entity_id"))
          .agg(count(lit(1)).as("n_records"),
            min(when(col("src") === "crm", col("name"))).as("name"),
            round(max(col("acctbal")), 2).as("acctbal"),
            min(col("segment")).as("segment"))
      },
      // TRUE transitive closure (the dedup_clusters pattern) instead of
      // the pairs-are-components closed form: at sf0.1 one extra
      // above-threshold pair chains two planted pairs into a single
      // component — Spark's CC merges them correctly, the closed form
      // didn't
      Some(s"""WITH RECURSIVE $scoredSql,
              |matched AS (
              |  SELECT id_a, id_b FROM scored WHERE likelihood_ratio > 100.0),
              |edges AS (
              |  SELECT id_a AS a, id_b AS b FROM matched
              |  UNION ALL SELECT id_b, id_a FROM matched),
              |reach AS (
              |  SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
              |  UNION
              |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
              |cc AS (
              |  SELECT src AS rec_id, MIN(dst) AS entity_id
              |  FROM reach GROUP BY src),
              |labeled AS (
              |  SELECT r.*, COALESCE(c.entity_id, r.rec_id) AS entity_id
              |  FROM recs r LEFT JOIN cc c ON c.rec_id = r.rec_id)
              |SELECT entity_id, cast(count(*) AS BIGINT) AS n_records,
              |  min(CASE WHEN src = 'crm' THEN name END) AS name,
              |  round(max(acctbal), 2) AS acctbal,
              |  min(segment) AS segment
              |FROM labeled GROUP BY 1""".stripMargin))
  )
}
