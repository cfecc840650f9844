package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Scores are computed element-wise in DOUBLE on both sides and rounded to
  * 4 decimals before ranking: double-precision jitter between engines is
  * ~1e-13, far below the rounding granularity, so ranks are deterministic
  * (ties broken by neighbor id).
  *
  * The dot product / norm run as native codegen'd Catalyst expressions
  * (graft.expr.VectorExpressions — fused loop, no zipped intermediate
  * array), with the SAME sequential double fold as the DuckDB oracle.
  */
object SimQueries {
  import graft.expr.VectorExpressions.{dotProduct, vecNorm}

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Schema-adaptive `events.parquet` reader. The generator has shipped
    * `ts` both as TIMESTAMP(NANOS) — which Spark's vectorized reader only
    * accepts under `spark.sql.legacy.parquet.nanosAsLong`, surfacing the
    * column as BIGINT nanoseconds — and as plain timestamp[us], which
    * surfaces as TIMESTAMP_NTZ. Normalize here to session-zone TIMESTAMP
    * at microsecond precision so every event query sees ONE type
    * regardless of the file vintage. All entry points run with session
    * timezone UTC, so the NTZ→LTZ cast is value-preserving. */
  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported parquet surface type $other")
    }
  }

  /** One persisted lineitem⋈orders⋈customer frame per (session, sfDir) for
    * spearman_corr: its plan reads the joined frame THREE times (x-rank
    * counts, y-rank counts, final rank attach) — uncached, the 3-way join
    * re-executes per consumer (measured 344 s at sf30, ~1/3 repeated join
    * work). Tracked in a map — not an inline `.persist` — so there is
    * exactly ONE live copy per session (not one per invocation) and the
    * bench's cold-evict hook can release it and re-price the build each
    * pass; same convention as [[ErQueries]]'s pairCache. MEMORY_AND_DISK:
    * spills rather than recomputes; Verify's storageFraction=0.05 lets
    * execution evict it under pressure. */
  private val spearmanCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  def evictShared(s: SparkSession): Unit =
    spearmanCache.keys.filter(_._1 eq s).foreach { k =>
      spearmanCache.remove(k).foreach(df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () })
    }

  private def spearmanJoined(s: SparkSession, dir: String): DataFrame = {
    // one live frame per session: a caller walking several sfDirs (the
    // test suite does) would otherwise strand persisted blocks per dir
    spearmanCache.keys.filter(k => (k._1 eq s) && k._2 != dir).foreach { k =>
      spearmanCache.remove(k).foreach(df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () })
    }
    spearmanCache.getOrElseUpdate((s, dir),
      s.read.parquet(s"$dir/lineitem.parquet")
        .join(s.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .join(s.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** DuckDB 1.0 equivalent (list_transform/list_zip — no comprehensions);
    * list_sum folds sequentially like Spark's aggregate(), so the doubles
    * are bit-identical. */
  private def cosDuck(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), s -> cast(s[1] as double) * cast(s[2] as double)))
       | / (sqrt(list_sum(list_transform($a, x -> cast(x as double) * cast(x as double))))
       |    * sqrt(list_sum(list_transform($b, x -> cast(x as double) * cast(x as double)))))""".stripMargin

  /** Distributed top-k per query over `(query_id, neighbor_id, score)`
    * candidates, score DESC / neighbor_id ASC — the rank every ANN family
    * member needs. A `row_number()` window must SHUFFLE AND SORT every
    * candidate (the shape that spilled for geo_knn at sf30, round 12);
    * the [[graft.expr.TopKPairs]] bounded-heap aggregate reduces each map
    * task's candidates to ≤ k per group BEFORE the exchange, so the
    * shuffle carries O(queries × k) rows, not O(candidates). Scores in
    * this family are `round(x, 4)` doubles by contract, so score × 10⁴ is
    * an EXACT long: ord = −(score·10⁴) ascending ⇔ score descending, and
    * the decode `round(−ord/10⁴, 4)` reproduces the identical double
    * (both are the nearest-double of the same 4-decimal value). Ties on
    * ord break on payload (neighbor_id) ascending — the window's exact
    * ORDER BY. */
  private def topKByScore(cands: DataFrame, k: Int, scoreName: String): DataFrame =
    cands
      .withColumn("__ord", (-round(col(scoreName) * 10000)).cast("long"))
      .groupBy(col("query_id"))
      .agg(graft.expr.TopKPairs.topKPairs(
        struct(col("__ord"), col("neighbor_id")), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), col("col.payload").as("neighbor_id"),
        round(-col("col.ord") / lit(10000.0), 4).as(scoreName),
        (col("pos") + 1).cast("long").as("rank"))

  /** brute-force cosine top-k — the exactness baseline. Scale shape:
    * broadcast the QUERY set (small by construction), stream the corpus,
    * rank through the bounded-heap aggregate (see [[topKByScore]]). */
  private def bruteTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(q).join(e.filter(col("vec_id") >= 10))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dotProduct(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 4).as("cos_sim"))
    topKByScore(scored, k, "cos_sim")
  }

  /** LSH ANN top-k: deterministic sign-random-projection buckets from
    * md5-derived hyperplanes. Hyperplanes are DATA-INDEPENDENT — derived
    * ONCE on the driver (md5 parity per (plane, dim), same formula as the
    * DuckDB oracle) and embedded as constant array literals: the per-row
    * work is just the 64-wide dot product, not 6×64 md5 calls. */
  private def lshTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val nPlanes = 6
    val e = emb(s, dir)
    val md = java.security.MessageDigest.getInstance("MD5")
    def planeOf(j: Int): Seq[Double] = (0 until 64).map { d =>
      val hex = md.digest(s"$j:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      (Integer.parseInt(hex, 16) % 2).toDouble * 2 - 1
    }
    val planeBit = (j: Int) => dotProduct(col("embedding"), typedLit(planeOf(j)))
    val bucketed = e.withColumn("bucket",
      (0 until nPlanes).map(j => when(planeBit(j) > 0, 1L << j).otherwise(0L)).reduce(_ + _))
      .withColumn("nrm", vecNorm(col("embedding")))
    val q = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val cands = broadcast(q).join(bucketed.filter(col("vec_id") >= 10), Seq("bucket"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dotProduct(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 4).as("cos_sim"))
    topKByScore(cands, k, "cos_sim")
  }

  /** CODEBOOK AS DATA, shared by the IVF family (`ivf_ann`, `semdedup`,
    * `ivf_cell_silhouette`, `ivf_nprobe_sweep`, `ivfpqTopK`): the first
    * `nlist` corpus vectors as a (cid, cvec, cnrm) DATAFRAME. Previously
    * each site collected the centroids and drove them through typedLit
    * argmax chains — exact, but the expression tree grew with nlist and
    * at the production nlist ≈ √N (thousands of centroids) plan size
    * becomes the limit. Kept as data the codebook broadcasts (tiny build
    * side) and the plan is O(1) in nlist; values are unchanged because
    * dot/norm are the same sequential folds over the same floats. */
  private def ivfCents(e: DataFrame, nlist: Int): DataFrame =
    e.filter(col("vec_id") >= 10 && col("vec_id") < 10 + nlist)
      .select((col("vec_id") - 10).cast("long").as("cid"),
        col("embedding").as("cvec"), vecNorm(col("embedding")).as("cnrm"))

  /** every input vector × centroid, scored with the rounded cosine — the
    * one primitive behind cell assignment (argmax via max(struct)),
    * probing (per-vector top-nprobe window) and silhouette (top-2).
    * Requires `e` to carry `nrm`. */
  private def ivfScores(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("s", round(dotProduct(col("embedding"), col("cvec")) /
        (col("nrm") * col("cnrm")), 4))

  /** nearest-centroid assignment from [[ivfScores]] rows: argmax rounded
    * cosine, tie → min cid (max(struct(s, −cid)) — the same ordering the
    * old greatest(struct…) literal chain produced), carrying the float
    * vector and its norm through for downstream scoring. */
  private def ivfAssign(scores: DataFrame): DataFrame =
    scores.groupBy(col("vec_id"))
      .agg(max(struct(col("s"), (-col("cid")).as("nc"))).as("__b"),
        first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (-col("__b.nc")).cast("long").as("cell"))

  /** PQ CODEBOOK AS DATA (shared by `pqTopK`, `ivfpqTopK`,
    * `quantization_distortion`): one row per (subspace m, centroid j) —
    * cv = the m-th dsub-wide slice of corpus vector 10+j, cn2 = its
    * squared norm (sequential fold, matching the old Scala-side sum). */
  private def pqCents(e: DataFrame, M: Int, dsub: Int, ksub: Int): DataFrame =
    e.filter(col("vec_id") >= 10 && col("vec_id") < 10 + ksub)
      .select((col("vec_id") - 10).cast("int").as("j"), col("embedding"))
      .withColumn("m", explode(typedLit((0 until M).toList)))
      .select(col("m"), col("j"),
        slice(col("embedding"), col("m") * dsub + 1, lit(dsub)).as("cv"))
      .withColumn("cn2", aggregate(col("cv"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** per-(vector, subspace) PQ code from [[pqCents]]: argmin rounded L2²,
    * tie → min j — identical to the old least(struct…) literal chain.
    * Emits (vec_id, m, j, cn2, d2) — d2 is the chosen code's residual,
    * which is exactly the distortion term `quantization_distortion`
    * reports. */
  private def pqCodes(corpus: DataFrame, cents: DataFrame, dsub: Int): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .withColumn("d2", round(aggregate(
        zip_with(slice(col("embedding"), col("m") * dsub + 1, lit(dsub)), col("cv"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v), 4))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("j"), col("cn2"))).as("__c"))
      .select(col("vec_id"), col("m"), col("__c.j").as("j"),
        col("__c.cn2").as("cn2"), col("__c.d2").as("d2"))

  /** per-(query, subspace, centroid) asymmetric-distance LUT rows from
    * [[pqCents]]: d = dot(q_m, centroid(m,j)), plus the query norm.
    * Emits (query_id, m, j, d, qn). Requires `queries` to carry `nrm`. */
  private def pqLut(queries: DataFrame, cents: DataFrame, dsub: Int): DataFrame =
    queries.crossJoin(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("m"), col("j"),
        dotProduct(slice(col("embedding"), col("m") * dsub + 1, lit(dsub)),
          col("cv")).as("d"),
        col("nrm").as("qn"))

  /** asymmetric-distance score per (query, neighbor) from LUT ⋈ codes:
    * approx_cos = (Σ_m d_{m,code_m}) / (qn · sqrt(Σ_m cn2_{m,code_m})),
    * both sums in FIXED m order (max-per-m then a literal left-assoc
    * chain) so the doubles bit-match the old element_at chain and the
    * oracle's FILTER formulation. */
  private def pqScore(codes: DataFrame, lut: DataFrame, M: Int): DataFrame = {
    val joined = codes.join(broadcast(lut), Seq("m", "j"))
    val dSum = (0 until M).map(m => max(when(col("m") === m, col("d"))))
      .reduce(_ + _)
    val n2Sum = (0 until M).map(m => max(when(col("m") === m, col("cn2"))))
      .reduce(_ + _)
    joined.groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(round(dSum / (max(col("qn")) * sqrt(n2Sum)), 4).as("approx_cos"))
  }

  /** int8 SQ index search (see the `sq_ann` Q for the full design notes):
    * integer coarse top-50 on globally min/max-quantized vectors, float
    * rerank to top-k. Shared by `sq_ann` and the `sq_recall` eval. */
  private def sqTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, dir)
    val mm = e.agg(min(array_min(col("embedding"))), max(array_max(col("embedding")))).head()
    val lo = mm.getFloat(0).toDouble; val hi = mm.getFloat(1).toDouble
    val quantized = e
      .withColumn("qv", transform(col("embedding"), v =>
        least(floor((v.cast("double") - lit(lo)) / lit(hi - lo) * lit(256.0)), lit(255.0))
          .cast("long")))
      .withColumn("nrm", vecNorm(col("embedding")))
    val q = quantized.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    // native codegen'd integer dot (graft.expr.IntDotProduct) — the HOF
    // form aggregate(zip_with(...)) drops out of whole-stage codegen, and
    // this is the hot loop of the quantized scan; values are identical
    // (exact long arithmetic either way)
    // coarse scan carries ONLY (query, neighbor, integer score) — the
    // float vectors are re-fetched for the ≤50-per-query shortlist by a
    // broadcast join-back, so the candidate-scale stage never hauls them
    val coarse = broadcast(q.select(col("query_id"), col("qq")))
      .join(quantized.filter(col("vec_id") >= 10))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.expr.VectorExpressions.intDotProduct(col("qq"), col("qv"))
          .as("approx_score"))
    // integer scores embed directly: ord = −score (exact long)
    val short = coarse
      .groupBy(col("query_id"))
      .agg(graft.expr.TopKPairs.topKPairs(
        struct((-col("approx_score")).as("o"), col("neighbor_id")), 50).as("__top"))
      .select(col("query_id"), explode(col("__top")).as("t"))
      .select(col("query_id"), col("t.payload").as("neighbor_id"),
        (-col("t.ord")).as("approx_score"))
    val nbrVecs = quantized.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("nrm"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    broadcast(short).join(nbrVecs, Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qe"), col("qn"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("approx_score"),
        round(dotProduct(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
  }

  /** PQ (product-quantization) index search, M=4 subspaces × 16 dims,
    * ksub=4 centroids per subspace (see the `pq_ann` Q for design notes):
    * corpus vectors collapse to 4 small codes, queries build a per-subspace
    * dot-product LUT against the codebook, scoring is LUT lookups only.
    * Shared by `pq_ann` and the `pq_recall` eval. */
  private def pqTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val M = 4; val dsub = 16; val ksub = 4
    val e = emb(s, dir)
    val cents = pqCents(e, M, dsub, ksub)
    val codes = pqCodes(e.filter(col("vec_id") >= 10), cents, dsub)
    val lut = pqLut(e.filter(col("vec_id") < 10)
      .withColumn("nrm", vecNorm(col("embedding"))), cents, dsub)
    val scored = pqScore(codes, lut, M)
    topKByScore(scored, k, "approx_cos")
  }

  /** the PQ chain as DuckDB CTEs, ending in `scored`
    * (query_id, neighbor_id, approx_cos) — shared by the `pq_ann` and
    * `pq_recall` oracles */
  private lazy val pqDuckChain: String =
    """cent AS (
      |  SELECT m.m, e.vec_id - 10 AS j,
      |    list_slice(e.embedding, m.m*16+1, m.m*16+16) AS cv
      |  FROM embeddings e, range(0, 4) AS m(m)
      |  WHERE e.vec_id >= 10 AND e.vec_id < 14),
      |cdist AS (
      |  SELECT e.vec_id, c.m, c.j,
      |    round(list_sum(list_transform(
      |      list_zip(list_slice(e.embedding, c.m*16+1, c.m*16+16), c.cv),
      |      s -> (cast(s[1] AS double) - cast(s[2] AS double))
      |         * (cast(s[1] AS double) - cast(s[2] AS double)))), 4) AS d2,
      |    list_sum(list_transform(c.cv,
      |      x -> cast(x AS double) * cast(x AS double))) AS cn2
      |  FROM embeddings e, cent c
      |  WHERE e.vec_id >= 10),
      |codes AS (
      |  SELECT vec_id, m, j, cn2 FROM cdist
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m
      |    ORDER BY d2, j) = 1),
      |lut AS (
      |  SELECT q.vec_id AS query_id, c.m, c.j,
      |    list_sum(list_transform(
      |      list_zip(list_slice(q.embedding, c.m*16+1, c.m*16+16), c.cv),
      |      s -> cast(s[1] AS double) * cast(s[2] AS double))) AS d,
      |    sqrt(list_sum(list_transform(q.embedding,
      |      x -> cast(x AS double) * cast(x AS double)))) AS qn
      |  FROM embeddings q, cent c WHERE q.vec_id < 10),
      |scored AS (
      |  SELECT l.query_id, co.vec_id AS neighbor_id,
      |    round((((max(l.d) FILTER (l.m = 0) + max(l.d) FILTER (l.m = 1))
      |          + max(l.d) FILTER (l.m = 2)) + max(l.d) FILTER (l.m = 3))
      |      / (max(l.qn) * sqrt(
      |        ((max(co.cn2) FILTER (co.m = 0) + max(co.cn2) FILTER (co.m = 1))
      |          + max(co.cn2) FILTER (co.m = 2)) + max(co.cn2) FILTER (co.m = 3))),
      |      4) AS approx_cos
      |  FROM codes co JOIN lut l ON l.m = co.m AND l.j = co.j
      |  GROUP BY l.query_id, co.vec_id)""".stripMargin

  /** IVF-PQ composed index (the FAISS IVFPQ production shape): IVF coarse
    * cells bound the candidate set (nlist=8, nprobe=2 — the same
    * deterministic centroid assignment as `ivf_ann`), PQ asymmetric-
    * distance LUT scoring ranks WITHIN the probed cells only (M=4
    * subspaces × ksub=4, the same codebook as `pq_ann`), and only a
    * top-20 shortlist per query is reranked with the exact float cosine.
    * Scale story: at 100 TB the scan touches nprobe/nlist of the corpus,
    * reads PQ codes (16× smaller than float32), and fetches original
    * vectors for 20 rows per query — the composition is what makes
    * billion-vector serving tractable; neither half alone suffices.
    * Shared by `ivfpq_ann` and the `ivfpq_recall` eval. */
  private def ivfpqTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val M = 4; val dsub = 16; val ksub = 4; val nlist = 8; val nprobe = 2
    val shortlist = 20
    val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
    val icents = ivfCents(e, nlist)
    val pcents = pqCents(e, M, dsub, ksub)
    val scoredAll = ivfScores(e, icents)
    // corpus side: IVF cell (argmax rounded cosine, tie → min cid) and
    // the M PQ codes (argmin rounded L2², tie → min j); the float vector
    // rides along only for the rerank fetch
    val corpus = ivfAssign(scoredAll.filter(col("vec_id") >= 10))
    val codes = pqCodes(e.filter(col("vec_id") >= 10), pcents, dsub)
    val wq = Window.partitionBy(col("vec_id"))
      .orderBy(col("s").desc, col("cid").asc)
    val probed = scoredAll.filter(col("vec_id") < 10)
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cid").as("cell"))
    val lut = pqLut(e.filter(col("vec_id") < 10), pcents, dsub)
    // candidates bounded by the probed cells; the scoring scan reads PQ
    // codes + the broadcast LUT, never the original vectors — and the
    // shortlist rank rides the bounded-heap aggregate, so even the
    // PQ-scored candidate set never hits a window sort; only the ≤20
    // shortlist rows fetch the float vectors, by broadcast join-back
    val pairs = broadcast(probed).join(corpus, Seq("cell"))
      .select(col("query_id"), col("vec_id"))
    val dSum = (0 until M).map(m => max(when(col("m") === m, col("d"))))
      .reduce(_ + _)
    val n2Sum = (0 until M).map(m => max(when(col("m") === m, col("cn2"))))
      .reduce(_ + _)
    val cands = pairs.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "m", "j"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(round(dSum / (max(col("qn")) * sqrt(n2Sum)), 4).as("approx_cos"))
    val qvecs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val nbrVecs = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        col("nrm").as("nn"))
    val short = topKByScore(cands, shortlist, "approx_cos").drop("rank")
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    broadcast(short).join(nbrVecs, Seq("neighbor_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("approx_cos"),
        round(dotProduct(col("qv"), col("nv")) / (col("qn") * col("nn")), 4)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
  }

  /** the IVF-PQ chain as DuckDB CTEs, ending in `rer`
    * (query_id, neighbor_id, approx_cos, cos_sim) — shared by the
    * `ivfpq_ann` and `ivfpq_recall` oracles. IVF half = the `ivf_ann`
    * oracle chain; PQ half = `pqDuckChain` restricted to probed cells. */
  private lazy val ivfpqDuckChain: String =
    s"""icent AS (
       |  SELECT vec_id - 10 AS cid, embedding AS cvec
       |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 18),
       |iscored AS (
       |  SELECT e.vec_id, c.cid,
       |    round(${cosDuck("e.embedding", "c.cvec")}, 4) AS s
       |  FROM embeddings e, icent c),
       |corpus_cell AS (
       |  SELECT vec_id, cid AS cell FROM iscored WHERE vec_id >= 10
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) = 1),
       |query_cells AS (
       |  SELECT vec_id AS query_id, cid AS cell FROM iscored WHERE vec_id < 10
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) <= 2),
       |cent AS (
       |  SELECT m.m, e.vec_id - 10 AS j,
       |    list_slice(e.embedding, m.m*16+1, m.m*16+16) AS cv
       |  FROM embeddings e, range(0, 4) AS m(m)
       |  WHERE e.vec_id >= 10 AND e.vec_id < 14),
       |cdist AS (
       |  SELECT e.vec_id, c.m, c.j,
       |    round(list_sum(list_transform(
       |      list_zip(list_slice(e.embedding, c.m*16+1, c.m*16+16), c.cv),
       |      s -> (cast(s[1] AS double) - cast(s[2] AS double))
       |         * (cast(s[1] AS double) - cast(s[2] AS double)))), 4) AS d2,
       |    list_sum(list_transform(c.cv,
       |      x -> cast(x AS double) * cast(x AS double))) AS cn2
       |  FROM embeddings e, cent c
       |  WHERE e.vec_id >= 10),
       |codes AS (
       |  SELECT vec_id, m, j, cn2 FROM cdist
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |    ORDER BY d2, j) = 1),
       |lut AS (
       |  SELECT q.vec_id AS query_id, c.m, c.j,
       |    list_sum(list_transform(
       |      list_zip(list_slice(q.embedding, c.m*16+1, c.m*16+16), c.cv),
       |      s -> cast(s[1] AS double) * cast(s[2] AS double))) AS d,
       |    sqrt(list_sum(list_transform(q.embedding,
       |      x -> cast(x AS double) * cast(x AS double)))) AS qn
       |  FROM embeddings q, cent c WHERE q.vec_id < 10),
       |pairs AS (
       |  SELECT qc.query_id, cc.vec_id AS neighbor_id
       |  FROM query_cells qc JOIN corpus_cell cc ON qc.cell = cc.cell),
       |scored AS (
       |  SELECT l.query_id, co.vec_id AS neighbor_id,
       |    round((((max(l.d) FILTER (l.m = 0) + max(l.d) FILTER (l.m = 1))
       |          + max(l.d) FILTER (l.m = 2)) + max(l.d) FILTER (l.m = 3))
       |      / (max(l.qn) * sqrt(
       |        ((max(co.cn2) FILTER (co.m = 0) + max(co.cn2) FILTER (co.m = 1))
       |          + max(co.cn2) FILTER (co.m = 2)) + max(co.cn2) FILTER (co.m = 3))),
       |      4) AS approx_cos
       |  FROM pairs p
       |  JOIN codes co ON co.vec_id = p.neighbor_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.m = co.m AND l.j = co.j
       |  GROUP BY l.query_id, co.vec_id),
       |short AS (
       |  SELECT * FROM scored
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx_cos DESC, neighbor_id ASC) <= 20),
       |rer AS (
       |  SELECT t.query_id, t.neighbor_id, t.approx_cos,
       |    round(${cosDuck("qa.embedding", "qb.embedding")}, 4) AS cos_sim
       |  FROM short t JOIN embeddings qa ON qa.vec_id = t.query_id
       |               JOIN embeddings qb ON qb.vec_id = t.neighbor_id)""".stripMargin

  val all: Seq[Q] = Seq(

    // IVF-PQ composed index + its acceptance eval — see ivfpqTopK for the
    // design; this is the billion-vector serving shape (coarse cells ×
    // 16×-compressed codes × bounded exact rerank).
    Q("ivfpq_ann",
      (s, dir) => ivfpqTopK(s, dir, 3),
      Some(s"""WITH $ivfpqDuckChain
              |SELECT query_id, neighbor_id, approx_cos, cos_sim,
              |  cast(rank AS BIGINT) AS rank
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM rer)
              |WHERE rank <= 3""".stripMargin)),

    Q("ivfpq_recall",
      (s, dir) => {
        val truth = bruteTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
        val approx = ivfpqTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1L))
        truth.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
          .withColumn("recall_at_3",
            col("n_found").cast("double") / col("n_true"))
      },
      Some(s"""WITH $ivfpqDuckChain,
              |ivfpq AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM rer)
              |  WHERE rank <= 3),
              |brute_scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10),
              |brute AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM brute_scored)
              |  WHERE rank <= 3)
              |SELECT b.query_id, cast(count(*) AS BIGINT) AS n_true,
              |  cast(count(p.neighbor_id) AS BIGINT) AS n_found,
              |  cast(count(p.neighbor_id) AS double) / count(*) AS recall_at_3
              |FROM brute b LEFT JOIN ivfpq p
              |  ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
              |GROUP BY b.query_id""".stripMargin)),

    // brute-force cosine top-k: the exactness baseline for ANN.
    // Scale shape: broadcast the QUERY set (small by construction) and
    // stream the corpus — never the other way around.
    Q("cosine_topk",
      (s, dir) => bruteTopK(s, dir, 5),
      Some(s"""WITH scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10),
              |ranked AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored)
              |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5""".stripMargin)),

    // embedding-cosine near-duplicate pairs above a threshold (bounded
    // neighborhood: same label partition — the IVF-style pruning).
    // Both sides are the corpus, so this must be a SHUFFLED equi-join on
    // label (both sides hash-partition by label; co-located pair generation,
    // no full-corpus broadcast). AQE splits skewed label partitions.
    Q("embed_near_dup",
      (s, dir) => {
        val e = emb(s, dir).select(col("vec_id"), col("label"), col("embedding"))
          .withColumn("nrm", vecNorm(col("embedding")))
        val e2 = e.select(col("vec_id").as("vec_id_2"), col("label").as("label_2"),
          col("embedding").as("embedding_2"), col("nrm").as("nrm_2"))
        e.hint("shuffle_hash")
          .join(e2, col("label") === col("label_2") && col("vec_id") < col("vec_id_2"))
          .select(col("vec_id"), col("vec_id_2"),
            round(dotProduct(col("embedding"), col("embedding_2")) / (col("nrm") * col("nrm_2")), 4).as("cos_sim"))
          .filter(col("cos_sim") >= 0.3)
      },
      Some(s"""WITH scored AS (
              |  SELECT a.vec_id, b.vec_id AS vec_id_2,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM embeddings a JOIN embeddings b
              |    ON a.label = b.label AND a.vec_id < b.vec_id)
              |SELECT * FROM scored WHERE cos_sim >= 0.3""".stripMargin)),

    // DAU / WAU / STICKINESS: exact daily actives and trailing-7-day
    // actives per day, stickiness = DAU/WAU — the canonical engagement
    // panel. The 7-day distinct is EXACT via a bounded range join of the
    // (day, user) distinct table to the day spine (≤7× fanout, then one
    // distinct-count groupBy) — no sliding-window approximation, no
    // global window.
    Q("dau_wau_stickiness",
      (s, dir) => {
        val ev = events(s, dir)
        val du = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val dau = du.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
        val spine = du.select(col("day").as("d")).distinct()
        val wau = du.join(spine,
            col("day") <= col("d") && col("day") >= date_sub(col("d"), 6))
          .groupBy(col("d").as("day"))
          .agg(countDistinct(col("user_id")).as("wau"))
        dau.join(wau, Seq("day"))
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT cast(ts AS DATE) AS day, user_id FROM events),
             |dau AS (
             |  SELECT day, cast(count(DISTINCT user_id) AS BIGINT) AS dau
             |  FROM du GROUP BY 1),
             |spine AS (SELECT DISTINCT day AS d FROM du),
             |wau AS (
             |  SELECT s.d AS day,
             |    cast(count(DISTINCT du.user_id) AS BIGINT) AS wau
             |  FROM du JOIN spine s
             |    ON du.day <= s.d AND du.day >= s.d - 6
             |  GROUP BY 1)
             |SELECT day, dau, wau,
             |  round(cast(dau AS double) / wau, 6) AS stickiness
             |FROM dau JOIN wau USING (day)""".stripMargin)),

    // SEASONAL DECOMPOSITION (DOW-means STL-lite): split each (type, day)
    // count into the type's day-of-week seasonal mean and a residual —
    // what the spike detector SHOULD baseline against when traffic has a
    // weekly cycle (its trailing window conflates Monday with Sunday).
    // Means come from exact integer sums over the bounded daily table
    // and broadcast back; residuals are exact subtraction.
    Q("seasonal_decompose",
      (s, dir) => {
        val ev = events(s, dir)
        val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("dow", dayofweek(col("day")).cast("long"))
        val seasonal = daily.groupBy(col("event_type"), col("dow"))
          .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("n_days"))
          .withColumn("dow_mean",
            round(col("sum_n").cast("double") / col("n_days"), 4))
          .select(col("event_type"), col("dow"), col("dow_mean"))
        daily.join(broadcast(seasonal), Seq("event_type", "dow"))
          .select(col("event_type"), col("day"), col("dow"), col("n"),
            col("dow_mean"),
            round(col("n") - col("dow_mean"), 4).as("residual"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, cast(ts AS DATE) AS day,
             |    cast(count(*) AS BIGINT) AS n,
             |    cast(extract(dow FROM cast(ts AS DATE)) + 1 AS BIGINT) AS dow
             |  FROM events GROUP BY 1, 2),
             |seasonal AS (
             |  SELECT event_type, dow,
             |    round(cast(sum(n) AS double) / count(*), 4) AS dow_mean
             |  FROM daily GROUP BY 1, 2)
             |SELECT d.event_type, d.day, d.dow, d.n, s.dow_mean,
             |  round(d.n - s.dow_mean, 4) AS residual
             |FROM daily d JOIN seasonal s USING (event_type, dow)""".stripMargin)),

    // QUANTIZATION DISTORTION REPORT: reconstruction MSE of the int8 SQ
    // and PQ codecs over the indexed corpus — the distortion axis of the
    // compression trade-off (the recall evals give the retrieval axis;
    // together they justify a codec choice). SQ error is the analytic
    // midpoint-reconstruction residual per element; PQ error is the
    // chosen code's L2² residual (exactly the argmin d2 the code
    // assignment already computes). Per-vector folds are sequential and
    // identical across engines; corpus means round at 6.
    Q("quantization_distortion",
      (s, dir) => {
        val M = 4; val dsub = 16; val ksub = 4
        val e = emb(s, dir).filter(col("vec_id") >= 10)
        val mmr = emb(s, dir).agg(min(array_min(col("embedding"))),
          max(array_max(col("embedding")))).head()
        val lo = mmr.getFloat(0).toDouble; val hi = mmr.getFloat(1).toDouble
        // interpolated bounds wrapped in CAST(... AS DOUBLE): a bare
        // decimal literal parses as DECIMAL in Spark SQL and would drag
        // the arithmetic into decimal ops
        val (loS, hiS) = (s"CAST($lo AS DOUBLE)", s"CAST($hi AS DOUBLE)")
        val sqErr = e.select(col("vec_id"), round(expr(
          s"""aggregate(embedding, 0.0D, (acc, v) ->
             |  acc + pow(cast(v AS double) - ($loS +
             |    (least(floor((cast(v AS double) - $loS) / ($hiS - $loS) * 256.0),
             |           255.0) + 0.5) * ($hiS - $loS) / 256.0), 2)) / 64.0"""
            .stripMargin), 8).as("mse"))
        // PQ codebook AS DATA (pqCents/pqCodes): the per-(vector, m)
        // argmin residual is the distortion term; the Σ over m runs in
        // fixed m order so the double bit-matches the old literal chain
        val codes = pqCodes(e, pqCents(emb(s, dir), M, dsub, ksub), dsub)
        val resid = (0 until M).map(m => max(when(col("m") === m, col("d2"))))
          .reduce(_ + _)
        val pqErr = codes.groupBy(col("vec_id"))
          .agg(round(resid / 64.0, 8).as("mse"))
        def summarize(df: DataFrame, method: String) =
          df.agg(lit(method).as("method"), count(lit(1)).as("n_vectors"),
            round(avg(col("mse")), 6).as("mean_mse"),
            round(max(col("mse")), 8).as("max_mse"))
        summarize(sqErr, "sq_int8").unionByName(summarize(pqErr, "pq_m4x4"))
      },
      Some("""WITH mm AS (
             |  SELECT cast(min(list_min(embedding)) AS double) AS lo,
             |         cast(max(list_max(embedding)) AS double) AS hi
             |  FROM embeddings),
             |sqerr AS (
             |  SELECT e.vec_id,
             |    round(list_sum(list_transform(e.embedding, v ->
             |      pow(cast(v AS double) - (mm.lo +
             |        (least(floor((cast(v AS double) - mm.lo)
             |           / (mm.hi - mm.lo) * 256.0), 255.0) + 0.5)
             |        * (mm.hi - mm.lo) / 256.0), 2))) / 64.0, 8) AS mse
             |  FROM embeddings e, mm WHERE e.vec_id >= 10),
             |cent AS (
             |  SELECT m.m, e.vec_id - 10 AS j,
             |    list_slice(e.embedding, m.m*16+1, m.m*16+16) AS cv
             |  FROM embeddings e, range(0, 4) AS m(m)
             |  WHERE e.vec_id >= 10 AND e.vec_id < 14),
             |cdist AS (
             |  SELECT e.vec_id, c.m, c.j,
             |    round(list_sum(list_transform(
             |      list_zip(list_slice(e.embedding, c.m*16+1, c.m*16+16), c.cv),
             |      s -> (cast(s[1] AS double) - cast(s[2] AS double))
             |         * (cast(s[1] AS double) - cast(s[2] AS double)))), 4) AS d2
             |  FROM embeddings e, cent c WHERE e.vec_id >= 10),
             |chosen AS (
             |  SELECT vec_id, m, d2 FROM cdist
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m
             |    ORDER BY d2, j) = 1),
             |pqerr AS (
             |  SELECT vec_id,
             |    round((((max(CASE WHEN m = 0 THEN d2 END)
             |       + max(CASE WHEN m = 1 THEN d2 END))
             |       + max(CASE WHEN m = 2 THEN d2 END))
             |       + max(CASE WHEN m = 3 THEN d2 END)) / 64.0, 8) AS mse
             |  FROM chosen GROUP BY vec_id)
             |SELECT 'sq_int8' AS method, cast(count(*) AS BIGINT) AS n_vectors,
             |  round(avg(mse), 6) AS mean_mse, round(max(mse), 8) AS max_mse
             |FROM sqerr
             |UNION ALL
             |SELECT 'pq_m4x4', cast(count(*) AS BIGINT),
             |  round(avg(mse), 6), round(max(mse), 8)
             |FROM pqerr""".stripMargin)),

    // GINI REVENUE CONCENTRATION via a bucketed Lorenz curve: how much
    // of the money the top users account for — the whale metric. An
    // exact Gini needs a GLOBAL sort; bucketing per-user revenue into
    // 100 exact-cent-range buckets makes the Lorenz cumulative a
    // triangular join over the BOUNDED bucket table (the ks_bucketed
    // trick), with the trapezoid term per bucket needing only its own
    // share and its cumulative: Σ fᵢ·(2Lᵢ − lᵢ). Documented
    // approximation: within-bucket ordering is lost (granularity 1/100).
    Q("gini_user_revenue",
      (s, dir) => {
        val ev = events(s, dir).filter(col("event_type") === "purchase")
        val users = ev.groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        val mm = users.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        val byb = users.crossJoin(broadcast(mm))
          .select(expr("least((cents - lo) * 100 div (hi - lo + 1), 99)")
            .as("bucket"), col("cents"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents"))
        val tot = byb.agg(sum(col("n_users")).as("n"), sum(col("cents")).as("c"))
        val b2 = byb.select(col("bucket").as("b2"), col("n_users").as("nu2"),
          col("cents").as("c2"))
        val cum = byb.join(broadcast(b2), col("b2") <= col("bucket"))
          .groupBy(col("bucket"), col("n_users"), col("cents"))
          .agg(sum(col("nu2")).as("cum_n"), sum(col("c2")).as("cum_c"))
        cum.crossJoin(broadcast(tot))
          .select((col("n_users").cast("double") / col("n")).as("fi"),
            (col("cents").cast("double") / col("c")).as("li"),
            (col("cum_c").cast("double") / col("c")).as("bigL"))
          .agg(count(lit(1)).as("n_buckets"),
            round(lit(1.0) - sum(col("fi") * (lit(2.0) * col("bigL") - col("li"))),
              6).as("gini"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |mm AS (SELECT min(cents) AS lo, max(cents) AS hi FROM u),
             |byb AS (
             |  SELECT least((cents - mm.lo) * 100 // (mm.hi - mm.lo + 1), 99)
             |    AS bucket,
             |    cast(count(*) AS BIGINT) AS n_users,
             |    cast(sum(cents) AS BIGINT) AS cents
             |  FROM u, mm GROUP BY 1),
             |tot AS (SELECT sum(n_users) AS n, sum(cents) AS c FROM byb),
             |cum AS (
             |  SELECT a.bucket, a.n_users, a.cents,
             |    sum(b.n_users) AS cum_n, sum(b.cents) AS cum_c
             |  FROM byb a JOIN byb b ON b.bucket <= a.bucket
             |  GROUP BY 1, 2, 3)
             |SELECT cast(count(*) AS BIGINT) AS n_buckets,
             |  round(1.0 - sum((cast(n_users AS double) / t.n)
             |    * (2.0 * (cast(cum_c AS double) / t.c)
             |       - cast(cents AS double) / t.c)), 6) AS gini
             |FROM cum, tot t""".stripMargin)),

    // COHORT LTV CURVE: cumulative revenue per signup-week cohort by
    // week-of-age — the payback readout behind retention_cohorts (that
    // query counts RETURNING USERS; this one accumulates MONEY). Exact
    // cents; the cumulative runs as a triangular join over the bounded
    // (cohort × age) grid, never a window over raw events.
    Q("cohort_ltv_curve",
      (s, dir) => {
        val ev = events(s, dir)
        val firstDay = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("first_day"))
          .select(col("user_id"),
            expr("datediff(first_day, DATE '2024-01-01') div 7")
              .as("cohort_week"))
        val weekly = ev.filter(col("event_type") === "purchase")
          .join(firstDay, Seq("user_id"))
          .select(col("cohort_week"),
            expr("datediff(to_date(ts), DATE '2024-01-01') div 7").as("week"),
            round(col("value") * 100).cast("long").as("cents"))
          .withColumn("age", col("week") - col("cohort_week"))
          .filter(col("age") >= 0)
          .groupBy(col("cohort_week"), col("age"))
          .agg(sum(col("cents")).as("cents"))
        val w2 = weekly.select(col("cohort_week").as("cw2"),
          col("age").as("age2"), col("cents").as("c2"))
        weekly.join(broadcast(w2),
            col("cw2") === col("cohort_week") && col("age2") <= col("age"))
          .groupBy(col("cohort_week"), col("age"), col("cents"))
          .agg(round(sum(col("c2")).cast("double") / 100.0, 2).as("cum_revenue"))
          .select(col("cohort_week"), col("age"),
            round(col("cents").cast("double") / 100.0, 2).as("week_revenue"),
            col("cum_revenue"))
      },
      Some("""WITH fd AS (
             |  SELECT user_id,
             |    date_diff('day', DATE '2024-01-01', min(cast(ts AS DATE))) // 7
             |      AS cohort_week
             |  FROM events GROUP BY user_id),
             |weekly AS (
             |  SELECT f.cohort_week,
             |    (date_diff('day', DATE '2024-01-01', cast(e.ts AS DATE)) // 7)
             |      - f.cohort_week AS age,
             |    cast(sum(cast(round(e.value * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM events e JOIN fd f USING (user_id)
             |  WHERE e.event_type = 'purchase'
             |    AND (date_diff('day', DATE '2024-01-01', cast(e.ts AS DATE)) // 7)
             |        >= f.cohort_week
             |  GROUP BY 1, 2)
             |SELECT a.cohort_week, a.age,
             |  round(cast(a.cents AS double) / 100.0, 2) AS week_revenue,
             |  round(cast(sum(b.cents) AS double) / 100.0, 2) AS cum_revenue
             |FROM weekly a JOIN weekly b
             |  ON b.cohort_week = a.cohort_week AND b.age <= a.age
             |GROUP BY 1, 2, 3""".stripMargin)),

    // BUCKETED TWO-SAMPLE KS TEST: sup |F_A − F_B| between the variants'
    // purchase-value distributions at 100-bucket granularity — the
    // nonparametric check that catches distribution shifts the mean
    // tests miss (same mean, fatter tail). Exact integer-cent bucket
    // counts; CDFs via a triangular join over the BOUNDED bucket table
    // (100² pairs, never the raw values); the bucketing makes the
    // statistic a documented lower bound of exact KS.
    Q("ks_bucketed",
      (s, dir) => {
        val ev = events(s, dir).filter(col("event_type") === "purchase")
          .select(when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B")
            .as("variant"),
            round(col("value") * 100).cast("long").as("cents"))
        val mm = ev.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        val bucketed = ev.crossJoin(broadcast(mm))
          // `div`, not `/`: Spark / on longs is true division
          .select(col("variant"),
            expr("least((cents - lo) * 100 div (hi - lo + 1), 99)").as("bucket"))
          .groupBy(col("variant"), col("bucket"))
          .agg(count(lit(1)).as("n"))
        val totals = bucketed.groupBy("variant").agg(sum(col("n")).as("nt"))
        val grid = bucketed.join(broadcast(totals), Seq("variant"))
        val a = grid.filter(col("variant") === "A")
          .select(col("bucket").as("ba"), (col("n").cast("double") / col("nt"))
            .as("pa"))
        val bq = grid.filter(col("variant") === "B")
          .select(col("bucket").as("bb"), (col("n").cast("double") / col("nt"))
            .as("pb"))
        val spine = bucketed.select(col("bucket")).distinct()
        val cdf = spine
          .join(broadcast(a), col("ba") <= col("bucket"), "left")
          .groupBy("bucket").agg(round(sum(coalesce(col("pa"), lit(0.0))), 6)
            .as("fa"))
          .join(broadcast(spine
            .join(broadcast(bq), col("bb") <= col("bucket"), "left")
            .groupBy("bucket").agg(round(sum(coalesce(col("pb"), lit(0.0))), 6)
              .as("fb"))), Seq("bucket"))
        cdf.agg(count(lit(1)).as("n_buckets"),
          round(max(abs(col("fa") - col("fb"))), 6).as("ks_stat"))
      },
      Some("""WITH p AS (
             |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             |    cast(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |mm AS (SELECT min(cents) AS lo, max(cents) AS hi FROM p),
             |b AS (
             |  SELECT variant,
             |    least((cents - mm.lo) * 100 // (mm.hi - mm.lo + 1), 99) AS bucket,
             |    cast(count(*) AS BIGINT) AS n
             |  FROM p, mm GROUP BY 1, 2),
             |t AS (SELECT variant, sum(n) AS nt FROM b GROUP BY 1),
             |g AS (SELECT b.*, t.nt FROM b JOIN t USING (variant)),
             |spine AS (SELECT DISTINCT bucket FROM b),
             |fa AS (
             |  SELECT s.bucket,
             |    round(sum(coalesce(CASE WHEN g.variant = 'A'
             |      THEN cast(g.n AS double) / g.nt END, 0.0)), 6) AS fa
             |  FROM spine s LEFT JOIN g ON g.bucket <= s.bucket
             |  GROUP BY 1),
             |fb AS (
             |  SELECT s.bucket,
             |    round(sum(coalesce(CASE WHEN g.variant = 'B'
             |      THEN cast(g.n AS double) / g.nt END, 0.0)), 6) AS fb
             |  FROM spine s LEFT JOIN g ON g.bucket <= s.bucket
             |  GROUP BY 1)
             |SELECT cast(count(*) AS BIGINT) AS n_buckets,
             |  round(max(abs(fa.fa - fb.fb)), 6) AS ks_stat
             |FROM fa JOIN fb USING (bucket)""".stripMargin)),

    // JENSEN-SHANNON DAILY MIX DRIFT: JSD between consecutive days'
    // event-type distributions — the bounded (≤ ln 2), symmetric drift
    // score that pages when the traffic MIX shifts even if volume
    // doesn't (volume detectors are blind to composition). Shares from
    // exact integer counts over the bounded (day × type) table; the
    // day-over-day join is calendar-keyed, missing types contribute
    // their full mass via the 0-side convention (0·ln0 = 0).
    Q("jsd_daily_drift",
      (s, dir) => {
        val ev = events(s, dir)
        val counts = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val totals = counts.groupBy("day").agg(sum(col("n")).as("nd"))
        val shares = counts.join(broadcast(totals), Seq("day"))
          .select(col("day"), col("event_type"),
            round(col("n").cast("double") / col("nd"), 6).as("p"))
        val prev = shares.select(date_add(col("day"), 1).as("day"),
          col("event_type"), col("p").as("q"))
        val joined = shares.join(prev, Seq("day", "event_type"), "full_outer")
          .filter(col("day").isNotNull)
          .select(col("day"), col("event_type"),
            coalesce(col("p"), lit(0.0)).as("p"),
            coalesce(col("q"), lit(0.0)).as("q"))
          // full-outer artifacts: day 1 has no prev (all q=0), the day
          // after the horizon has no current (all p=0) — keep only days
          // where BOTH distributions exist
          .withColumn("m", (col("p") + col("q")) / 2.0)
        val valid = joined.groupBy("day")
          .agg(sum(col("p")).as("sp"), sum(col("q")).as("sq"))
          .filter(col("sp") > 0.5 && col("sq") > 0.5)
          .select(col("day"))
        joined.join(broadcast(valid), Seq("day"))
          .groupBy("day")
          .agg(round(sum(
            when(col("p") > 0, lit(0.5) * col("p") * log(col("p") / col("m")))
              .otherwise(0.0) +
            when(col("q") > 0, lit(0.5) * col("q") * log(col("q") / col("m")))
              .otherwise(0.0)), 6).as("jsd"),
            count(lit(1)).as("n_types"))
      },
      Some("""WITH counts AS (
             |  SELECT cast(ts AS DATE) AS day, event_type,
             |    cast(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |totals AS (SELECT day, sum(n) AS nd FROM counts GROUP BY 1),
             |shares AS (
             |  SELECT c.day, c.event_type,
             |    round(cast(c.n AS double) / t.nd, 6) AS p
             |  FROM counts c JOIN totals t USING (day)),
             |prev AS (
             |  SELECT day + 1 AS day, event_type, p AS q FROM shares),
             |joined AS (
             |  SELECT coalesce(s.day, v.day) AS day,
             |    coalesce(s.event_type, v.event_type) AS event_type,
             |    coalesce(s.p, 0.0) AS p, coalesce(v.q, 0.0) AS q,
             |    (coalesce(s.p, 0.0) + coalesce(v.q, 0.0)) / 2.0 AS m
             |  FROM shares s FULL JOIN prev v
             |    ON s.day = v.day AND s.event_type = v.event_type),
             |valid AS (
             |  SELECT day FROM joined GROUP BY day
             |  HAVING sum(p) > 0.5 AND sum(q) > 0.5)
             |SELECT j.day,
             |  round(sum(
             |    CASE WHEN j.p > 0 THEN 0.5 * j.p * ln(j.p / j.m) ELSE 0.0 END
             |    + CASE WHEN j.q > 0 THEN 0.5 * j.q * ln(j.q / j.m) ELSE 0.0 END
             |  ), 6) AS jsd,
             |  cast(count(*) AS BIGINT) AS n_types
             |FROM joined j JOIN valid USING (day)
             |GROUP BY 1""".stripMargin)),

    // SESSION ENTRY-POINT CONVERSION: which first-event-of-session leads
    // to purchases — the "what's worth optimizing the landing for"
    // readout. Gap sessionization (the event_sessions policy: 30-minute
    // idle breaks) via two user-partitioned windows + one groupBy per
    // grain; entry type and converted flag are min_by/max aggregates
    // over the session, rates from exact integers.
    Q("session_entry_conversion",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val sessions = ev
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("brk",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
              1L).otherwise(0L))
          .withColumn("session_id", sum(col("brk")).over(
            Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, 0)))
        val perSession = sessions
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
            .getField("event_type").as("entry_type"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("converted"))
        perSession.groupBy(col("entry_type"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("converted")).as("n_converted"))
          .withColumn("conversion_rate",
            round(col("n_converted").cast("double") / col("n_sessions"), 6))
      },
      Some("""WITH seq AS (
             |  SELECT *,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR epoch_us(cast(ts AS TIMESTAMP))
             |         - epoch_us(cast(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM seq),
             |ranked AS (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_id
             |    ORDER BY ts, event_id) AS rn
             |  FROM sess),
             |per_session AS (
             |  SELECT user_id, session_id,
             |    max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS converted
             |  FROM ranked GROUP BY 1, 2)
             |SELECT entry_type, cast(count(*) AS BIGINT) AS n_sessions,
             |  cast(sum(converted) AS BIGINT) AS n_converted,
             |  round(cast(sum(converted) AS double) / count(*), 6)
             |    AS conversion_rate
             |FROM per_session GROUP BY 1""".stripMargin)),

    // ANOMALY CONSENSUS: the three daily detectors — median/MAD robust z
    // (event_anomaly_mad's policy), EWMA control-limit breach
    // (ewma_control_chart's), and day-of-week seasonal residual beyond
    // 2σ (seasonal_decompose's residual, scaled) — voted per (type, day);
    // consensus at ≥2 votes. Ensembling matters because each detector
    // has a blind spot (MAD ignores trend, EWMA lags level shifts, DOW
    // misses within-day bursts); agreement is what pages a human. All
    // three run from ONE bounded daily rollup; every comparison is on
    // rounded values so the votes are bit-stable.
    Q("anomaly_consensus",
      (s, dir) => {
        val ev = events(s, dir)
        val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("t", datediff(col("day"), lit("2024-01-01").cast("date"))
            .cast("long"))
          .withColumn("dow", dayofweek(col("day")).cast("long"))
        // detector 1: median/MAD robust z
        val med = daily.groupBy("event_type").agg(median(col("n")).as("med"))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("n").cast("double") - col("med")))
        val mad = dev.groupBy("event_type").agg(median(col("adev")).as("mad"))
        val d1 = dev.join(broadcast(mad), "event_type")
          .withColumn("rz", round(lit(0.6745) * (col("n") - col("med")) /
            nullif(col("mad"), lit(0.0)), 4))
          .select(col("event_type"), col("day"),
            (abs(coalesce(col("rz"), lit(0.0))) > 2.0).as("flag_mad"))
        // detector 2: EWMA breach (λ=0.3, L=3) via closed-form weights
        val lam = 0.3
        val b = daily.select(col("event_type").as("et2"), col("t").as("t2"),
          col("n").as("n2"))
        // sequential t2-ordered fold, not sum() — see ewma_control_chart
        // (order-dependent double summation flipped a rounding boundary)
        val ewma = daily.join(b,
            col("event_type") === col("et2") && col("t2") <= col("t"))
          .groupBy(col("event_type"), col("day"), col("t"), col("n"))
          .agg(array_sort(collect_list(struct(col("t2"), col("n2")))).as("terms"))
          .withColumn("ewma", round(expr(
            """aggregate(terms, 0D, (acc, e) -> acc + e.n2 *
              |  (CASE WHEN e.t2 = 0 THEN pow(0.7, t)
              |        ELSE 0.3 * pow(0.7, t - e.t2) END))""".stripMargin), 4))
          .drop("terms")
        val sig = daily.groupBy("event_type")
          .agg(stddev_pop(col("n")).as("sigma"))
        val infl = sqrt(lit(lam / (2 - lam)) *
          (lit(1.0) - pow(lit(1 - lam), lit(2) * (col("t") + 1))))
        val d2 = ewma.join(broadcast(sig), Seq("event_type"))
          .select(col("event_type"), col("day"),
            (col("n") > round(col("ewma") + lit(3.0) * col("sigma") * infl, 4) ||
              col("n") < round(col("ewma") - lit(3.0) * col("sigma") * infl, 4))
              .as("flag_ewma"))
        // detector 3: DOW seasonal residual beyond 2σ_resid
        val seas = daily.groupBy(col("event_type"), col("dow"))
          .agg(round(sum(col("n")).cast("double") / count(lit(1)), 4)
            .as("dow_mean"))
        val resid = daily.join(broadcast(seas), Seq("event_type", "dow"))
          .withColumn("resid", round(col("n") - col("dow_mean"), 4))
        val rsig = resid.groupBy("event_type")
          .agg(round(stddev_pop(col("resid")), 4).as("sigma_r"))
        val d3 = resid.join(broadcast(rsig), Seq("event_type"))
          .select(col("event_type"), col("day"),
            (abs(col("resid")) > lit(2.0) * col("sigma_r")).as("flag_seasonal"))
        d1.join(d2, Seq("event_type", "day")).join(d3, Seq("event_type", "day"))
          .withColumn("n_flags", (col("flag_mad").cast("int") +
            col("flag_ewma").cast("int") + col("flag_seasonal").cast("int"))
            .cast("long"))
          .withColumn("consensus", col("n_flags") >= 2)
      },
      Some("""WITH daily AS (
             |  SELECT event_type, cast(ts AS DATE) AS day,
             |    cast(count(*) AS BIGINT) AS n,
             |    date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS t,
             |    cast(extract(dow FROM cast(ts AS DATE)) + 1 AS BIGINT) AS dow
             |  FROM events GROUP BY 1, 2),
             |med AS (
             |  SELECT event_type, cast(median(n) AS double) AS med
             |  FROM daily GROUP BY 1),
             |dev AS (
             |  SELECT d.*, m.med, abs(cast(d.n AS double) - m.med) AS adev
             |  FROM daily d JOIN med m USING (event_type)),
             |mad AS (
             |  SELECT event_type, cast(median(adev) AS double) AS mad
             |  FROM dev GROUP BY 1),
             |d1 AS (
             |  SELECT d.event_type, d.day,
             |    abs(coalesce(round(0.6745 * (d.n - d.med)
             |      / nullif(a.mad, 0.0), 4), 0.0)) > 2.0 AS flag_mad
             |  FROM dev d JOIN mad a USING (event_type)),
             |ewt AS (
             |  SELECT a.event_type, a.day, a.t, a.n,
             |    list(ROW(b.t, b.n) ORDER BY b.t) AS terms
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND b.t <= a.t
             |  GROUP BY 1, 2, 3, 4),
             |ew AS (
             |  SELECT event_type, day, t, n,
             |    round(list_sum(list_transform(terms, e ->
             |      e[2] * CASE WHEN e[1] = 0 THEN pow(0.7, t)
             |        ELSE 0.3 * pow(0.7, t - e[1]) END)), 4) AS ewma
             |  FROM ewt),
             |sig AS (
             |  SELECT event_type, stddev_pop(n) AS sigma FROM daily GROUP BY 1),
             |d2 AS (
             |  SELECT e.event_type, e.day,
             |    e.n > round(e.ewma + 3.0 * s.sigma
             |      * sqrt(0.3 / 1.7 * (1.0 - pow(0.7, 2 * (e.t + 1)))), 4)
             |    OR e.n < round(e.ewma - 3.0 * s.sigma
             |      * sqrt(0.3 / 1.7 * (1.0 - pow(0.7, 2 * (e.t + 1)))), 4)
             |      AS flag_ewma
             |  FROM ew e JOIN sig s USING (event_type)),
             |seas AS (
             |  SELECT event_type, dow,
             |    round(cast(sum(n) AS double) / count(*), 4) AS dow_mean
             |  FROM daily GROUP BY 1, 2),
             |resid AS (
             |  SELECT d.event_type, d.day,
             |    round(d.n - s.dow_mean, 4) AS resid
             |  FROM daily d JOIN seas s USING (event_type, dow)),
             |rsig AS (
             |  SELECT event_type, round(stddev_pop(resid), 4) AS sigma_r
             |  FROM resid GROUP BY 1),
             |d3 AS (
             |  SELECT r.event_type, r.day,
             |    abs(r.resid) > 2.0 * g.sigma_r AS flag_seasonal
             |  FROM resid r JOIN rsig g USING (event_type))
             |SELECT d1.event_type, d1.day, d1.flag_mad, d2.flag_ewma,
             |  d3.flag_seasonal,
             |  cast(d1.flag_mad::int + d2.flag_ewma::int + d3.flag_seasonal::int
             |    AS BIGINT) AS n_flags,
             |  (d1.flag_mad::int + d2.flag_ewma::int + d3.flag_seasonal::int) >= 2
             |    AS consensus
             |FROM d1 JOIN d2 USING (event_type, day)
             |JOIN d3 USING (event_type, day)""".stripMargin)),

    // MARKOV NEXT-EVENT PREDICTION ACCURACY: train the first-order
    // transition argmax on the FIRST half of the month, score it on the
    // second — the acceptance eval that decides whether event_transitions
    // is a usable behavioral model or just a pretty matrix. Per-user LAG
    // windows build bigrams (one user-hash shuffle); train argmax is a
    // bounded groupBy (types²); scoring is a broadcast join of the tiny
    // model onto test bigrams. Ties break to the smaller event type.
    Q("markov_prediction_accuracy",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
        val mid = lit("2024-01-16").cast("date")
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val bigrams = ev
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_day", lead(to_date(col("ts")), 1).over(w))
          .filter(col("next_type").isNotNull)
        val train = bigrams.filter(col("next_day") < mid)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("event_type"))
          .agg(max(struct(col("n"), col("next_type"))).as("m"))
          .select(col("event_type"), col("m.next_type").as("predicted"))
        val test = bigrams.filter(col("next_day") >= mid)
          .select(col("event_type"), col("next_type"))
        test.join(broadcast(train), Seq("event_type"))
          .groupBy(col("event_type"), col("predicted"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("next_type") === col("predicted"), 1L).otherwise(0L))
              .as("n_correct"))
          .withColumn("accuracy",
            round(col("n_correct").cast("double") / col("n_test"), 6))
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    LEAD(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next_type,
             |    LEAD(cast(ts AS DATE)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next_day
             |  FROM events),
             |bigrams AS (SELECT * FROM seq WHERE next_type IS NOT NULL),
             |counts AS (
             |  SELECT event_type, next_type, count(*) AS n
             |  FROM bigrams WHERE next_day < DATE '2024-01-16' GROUP BY 1, 2),
             |train AS (
             |  SELECT event_type, next_type AS predicted FROM counts
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
             |    ORDER BY n DESC, next_type DESC) = 1),
             |test AS (
             |  SELECT event_type, next_type FROM bigrams
             |  WHERE next_day >= DATE '2024-01-16')
             |SELECT t.event_type, tr.predicted,
             |  cast(count(*) AS BIGINT) AS n_test,
             |  cast(sum(CASE WHEN t.next_type = tr.predicted THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_correct,
             |  round(cast(sum(CASE WHEN t.next_type = tr.predicted
             |    THEN 1 ELSE 0 END) AS double) / count(*), 6) AS accuracy
             |FROM test t JOIN train tr USING (event_type)
             |GROUP BY 1, 2""".stripMargin)),

    // EWMA CONTROL CHART per event type (SPC): the exponentially
    // weighted moving average of daily counts via its CLOSED FORM —
    // ewma_t = Σ_{i≤t} w(i,t)·x_i with w = λ(1−λ)^(t−i) (+ the (1−λ)^t
    // seed on x_0) — computed as a triangular join over the bounded
    // daily table, so the sequential recurrence never serializes the
    // plan. Control limits use the standard EWMA variance inflation;
    // breach = |x − ewma_prev| beyond L·σ_ewma. λ=0.3, L=3.
    // CUSUM control chart — the sequential-shift detector beside EWMA
    // and median/MAD. The textbook recursion C+_t = max(0, C+_{t-1} + x_t
    // − μ − k) is NOT windowable, but its closed form is: with S_t =
    // Σ(x_i − μ − k), C+_t = S_t − min(0, min_{i≤t} S_i) — one cumulative
    // sum + one running min per partition (both deterministic sequential
    // folds in either engine). Down-shifts mirror with a running max.
    // Flags at 5σ — the hour-28-style burst plus any sustained drift.
    Q("cusum_detector",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val stats = daily.groupBy("event_type").agg(
          (sum(col("n")).cast("double") / count(lit(1))).as("mu"),
          stddev_pop(col("n")).as("sigma"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(broadcast(stats), Seq("event_type"))
          .withColumn("s_up", sum(col("n") - col("mu") - col("sigma") * 0.5).over(w))
          .withColumn("s_dn", sum(col("n") - col("mu") + col("sigma") * 0.5).over(w))
          .withColumn("cusum_up",
            round(col("s_up") - least(lit(0.0), min(col("s_up")).over(w)), 4))
          .withColumn("cusum_dn",
            round(greatest(lit(0.0), max(col("s_dn")).over(w)) - col("s_dn"), 4))
          .select(col("event_type"), col("day"), col("n"),
            col("cusum_up"), col("cusum_dn"),
            (col("cusum_up") > col("sigma") * 5 ||
              col("cusum_dn") > col("sigma") * 5).as("shift_flag"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, cast(ts AS DATE) AS day,
             |    cast(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |st AS (
             |  SELECT event_type, cast(sum(n) AS double) / count(*) AS mu,
             |    stddev_pop(n) AS sigma
             |  FROM daily GROUP BY 1),
             |cum AS (
             |  SELECT d.event_type, d.day, d.n, st.sigma,
             |    sum(d.n - st.mu - st.sigma * 0.5) OVER (
             |      PARTITION BY d.event_type ORDER BY d.day
             |      ROWS UNBOUNDED PRECEDING) AS s_up,
             |    sum(d.n - st.mu + st.sigma * 0.5) OVER (
             |      PARTITION BY d.event_type ORDER BY d.day
             |      ROWS UNBOUNDED PRECEDING) AS s_dn
             |  FROM daily d JOIN st USING (event_type)),
             |cc AS (
             |  SELECT event_type, day, n, sigma,
             |    round(s_up - least(0.0, min(s_up) OVER (
             |      PARTITION BY event_type ORDER BY day
             |      ROWS UNBOUNDED PRECEDING)), 4) AS cusum_up,
             |    round(greatest(0.0, max(s_dn) OVER (
             |      PARTITION BY event_type ORDER BY day
             |      ROWS UNBOUNDED PRECEDING)) - s_dn, 4) AS cusum_dn
             |  FROM cum)
             |SELECT event_type, day, n, cusum_up, cusum_dn,
             |  cusum_up > sigma * 5 OR cusum_dn > sigma * 5 AS shift_flag
             |FROM cc""".stripMargin)),

    // SPEARMAN rank correlation per market segment — the robust sibling
    // (shared joined-frame cache: see spearmanJoined / evictShared below)
    // of the Pearson matrix (monotone association, outlier-immune).
    // Midranks with tie handling come from per-(segment, value)
    // PRE-AGGREGATES: rank_min = cumulative count of smaller values
    // (one PARTITIONED window over distinct values — bounded by the
    // value domain, not row count), avg_rank = rank_min + (ties−1)/2.
    // Ranks are half-integers and all moment sums stay < 2^53, so every
    // sum is exact in any order and the coefficient is deterministic.
    Q("spearman_corr",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = spearmanJoined(s, dir)
        // Average rank with ties from per-(seg, value) PRE-AGGREGATES via
        // a TWO-LEVEL prefix sum: values bucket by floor(v/4096), the
        // cumulative count runs per (seg, bucket) over DISTINCT values
        // (thousands of small window partitions), and per-seg bucket
        // OFFSETS come from one window over the ~2.5k bucket-total rows.
        // rank_avg = bucket_offset + within_bucket_cum − cnt + (cnt+1)/2.
        // This replaces a rank() window partitioned by `seg` alone over
        // RAW rows — |seg| = 5, so that plan degenerated to five
        // single-task 12M-row sorts at sf10 (287 s) and would be a
        // straight scale-killer at 100 TB. Here no window partition ever
        // exceeds the value-domain slice in a bucket, regardless of SF.
        def ranks(vcol: String, rname: String): DataFrame = {
          val W = 4096L
          val cnts = li.groupBy(col("seg"), col(vcol))
            .agg(count(lit(1)).as("cnt"))
            .withColumn("b", floor(col(vcol) / W))
          val wwin = Window.partitionBy("seg", "b").orderBy(vcol)
            .rowsBetween(Window.unboundedPreceding, 0)
          val bwin = Window.partitionBy("seg").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)
          val boff = cnts.groupBy("seg", "b").agg(sum("cnt").as("btot"))
            .withColumn("boff", coalesce(sum(col("btot")).over(bwin), lit(0L)))
            .select("seg", "b", "boff")
          cnts.withColumn("wcum", sum(col("cnt")).over(wwin))
            .join(boff, Seq("seg", "b"))
            .select(col("seg"), col(vcol),
              (col("boff") + col("wcum") - col("cnt") +
                (col("cnt") + 1) / 2.0).as(rname))
        }
        // x = l_quantity: domain-bounded (1..50 × 5 segments), so its rank
        // table broadcasts and rx attaches map-side; only the y ranks
        // (unbounded price domain) cost a shuffle join on (seg, y).
        li.join(broadcast(ranks("x", "rx")), Seq("seg", "x"))
          .join(ranks("y", "ry"), Seq("seg", "y"))
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n_rows"),
            round((count(lit(1)) * sum(col("rx") * col("ry")) -
              sum(col("rx")) * sum(col("ry"))) /
              (sqrt(count(lit(1)) * sum(col("rx") * col("rx")) -
                sum(col("rx")) * sum(col("rx"))) *
                sqrt(count(lit(1)) * sum(col("ry") * col("ry")) -
                  sum(col("ry")) * sum(col("ry")))), 6).as("spearman"))
      },
      Some("""WITH li AS (
             |  SELECT c.c_mktsegment AS seg, cast(l.l_quantity AS BIGINT) AS x,
             |    cast(round(l.l_extendedprice * 100) AS BIGINT) AS y
             |  FROM lineitem l
             |  JOIN orders o ON o.o_orderkey = l.l_orderkey
             |  JOIN customer c ON c.c_custkey = o.o_custkey),
             |rxs AS (
             |  SELECT seg, x,
             |    sum(cnt) OVER (PARTITION BY seg ORDER BY x
             |      ROWS UNBOUNDED PRECEDING) - cnt
             |      + cast(cnt + 1 AS double) / 2 AS rx
             |  FROM (SELECT seg, x, cast(count(*) AS BIGINT) AS cnt
             |        FROM li GROUP BY 1, 2)),
             |rys AS (
             |  SELECT seg, y,
             |    sum(cnt) OVER (PARTITION BY seg ORDER BY y
             |      ROWS UNBOUNDED PRECEDING) - cnt
             |      + cast(cnt + 1 AS double) / 2 AS ry
             |  FROM (SELECT seg, y, cast(count(*) AS BIGINT) AS cnt
             |        FROM li GROUP BY 1, 2))
             |SELECT li.seg, cast(count(*) AS BIGINT) AS n_rows,
             |  round((count(*) * sum(rx * ry) - sum(rx) * sum(ry)) /
             |    (sqrt(count(*) * sum(rx * rx) - sum(rx) * sum(rx)) *
             |     sqrt(count(*) * sum(ry * ry) - sum(ry) * sum(ry))), 6)
             |    AS spearman
             |FROM li
             |JOIN rxs ON rxs.seg = li.seg AND rxs.x = li.x
             |JOIN rys ON rys.seg = li.seg AND rys.y = li.y
             |GROUP BY li.seg""".stripMargin)),

    Q("ewma_control_chart",
      (s, dir) => {
        val ev = events(s, dir)
        val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("t", datediff(col("day"), lit("2024-01-01").cast("date"))
            .cast("long"))
        val b = daily.select(col("event_type").as("et2"), col("t").as("t2"),
          col("n").as("n2"))
        val lam = 0.3
        // weight of x_{t2} in ewma_t: λ(1-λ)^(t-t2), except the seed term
        // (t2 = 0) which carries the full (1-λ)^t. The weighted sum runs
        // as a SEQUENTIAL fold over the t2-sorted terms (identical order
        // on both engines — the cosine-similarity convention) instead of
        // sum(): distributive double summation is order-dependent under
        // partial aggregation, and one row's true value sat within a ulp
        // of the 1e-4 rounding boundary — the compare flipped with the
        // session's partitioning (caught round 12).
        val ewma = daily.join(b,
            col("event_type") === col("et2") && col("t2") <= col("t"))
          .groupBy(col("event_type"), col("day"), col("t"), col("n"))
          .agg(array_sort(collect_list(struct(col("t2"), col("n2")))).as("terms"))
          .withColumn("ewma", round(expr(
            """aggregate(terms, 0D, (acc, e) -> acc + e.n2 *
              |  (CASE WHEN e.t2 = 0 THEN pow(0.7, t)
              |        ELSE 0.3 * pow(0.7, t - e.t2) END))""".stripMargin), 4))
          .drop("terms")
        val stats = daily.groupBy("event_type")
          .agg(stddev_pop(col("n")).as("sigma"))
        ewma.join(broadcast(stats), Seq("event_type"))
          .withColumn("ucl", round(col("ewma") + lit(3.0) * col("sigma") *
            sqrt(lit(lam / (2 - lam)) *
              (lit(1.0) - pow(lit(1 - lam), lit(2) * (col("t") + 1)))), 4))
          .withColumn("lcl", round(col("ewma") - lit(3.0) * col("sigma") *
            sqrt(lit(lam / (2 - lam)) *
              (lit(1.0) - pow(lit(1 - lam), lit(2) * (col("t") + 1)))), 4))
          .select(col("event_type"), col("day"), col("n"), col("ewma"),
            col("ucl"), col("lcl"),
            (col("n") > col("ucl") || col("n") < col("lcl")).as("breach"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, cast(ts AS DATE) AS day,
             |    cast(count(*) AS BIGINT) AS n,
             |    date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS t
             |  FROM events GROUP BY 1, 2),
             |ewt AS (
             |  SELECT a.event_type, a.day, a.t, a.n,
             |    list(ROW(b.t, b.n) ORDER BY b.t) AS terms
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND b.t <= a.t
             |  GROUP BY 1, 2, 3, 4),
             |ew AS (
             |  SELECT event_type, day, t, n,
             |    round(list_sum(list_transform(terms, e ->
             |      e[2] * CASE WHEN e[1] = 0 THEN pow(0.7, t)
             |        ELSE 0.3 * pow(0.7, t - e[1]) END)), 4) AS ewma
             |  FROM ewt),
             |st AS (
             |  SELECT event_type, stddev_pop(n) AS sigma
             |  FROM daily GROUP BY 1)
             |SELECT e.event_type, e.day, e.n, e.ewma,
             |  round(e.ewma + 3.0 * st.sigma
             |    * sqrt(0.3 / 1.7 * (1.0 - pow(0.7, 2 * (e.t + 1)))), 4) AS ucl,
             |  round(e.ewma - 3.0 * st.sigma
             |    * sqrt(0.3 / 1.7 * (1.0 - pow(0.7, 2 * (e.t + 1)))), 4) AS lcl,
             |  e.n > round(e.ewma + 3.0 * st.sigma
             |    * sqrt(0.3 / 1.7 * (1.0 - pow(0.7, 2 * (e.t + 1)))), 4)
             |  OR e.n < round(e.ewma - 3.0 * st.sigma
             |    * sqrt(0.3 / 1.7 * (1.0 - pow(0.7, 2 * (e.t + 1)))), 4) AS breach
             |FROM ew e JOIN st USING (event_type)""".stripMargin)),

    // THEIL-SEN ROBUST TREND per event type: the median of all pairwise
    // daily-count slopes — the trend estimator that, like the MAD
    // detector, is immune to the spikes it coexists with (an OLS slope
    // is dragged by one burst day). Scale shape: the pair blow-up is a
    // self-join of the BOUNDED daily table (days² per type, ~400 rows),
    // never the raw events; one exact median over it.
    Q("theil_sen_trend",
      (s, dir) => {
        val ev = events(s, dir)
        val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("t", datediff(col("day"), lit("2024-01-01").cast("date"))
            .cast("long"))
        val b = daily.select(col("event_type").as("et2"), col("t").as("t2"),
          col("n").as("n2"))
        val slopes = daily.join(b,
            col("event_type") === col("et2") && col("t") < col("t2"))
          .select(col("event_type"),
            round((col("n2") - col("n")).cast("double") / (col("t2") - col("t")), 6)
              .as("slope"))
        slopes.groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"),
            round(median(col("slope")), 6).as("sen_slope"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, cast(ts AS DATE) AS day,
             |    cast(count(*) AS BIGINT) AS n,
             |    date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS t
             |  FROM events GROUP BY 1, 2),
             |slopes AS (
             |  SELECT a.event_type,
             |    round(cast(b.n - a.n AS double) / (b.t - a.t), 6) AS slope
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.t < b.t)
             |SELECT event_type, cast(count(*) AS BIGINT) AS n_pairs,
             |  round(cast(median(slope) AS double), 6) AS sen_slope
             |FROM slopes GROUP BY 1""".stripMargin)),

    // POINT-IN-TIME-CORRECT FEATURE JOIN (the feature-store primitive):
    // for every purchase (the training label), features computed from
    // STRICTLY EARLIER events of the same user — prior-click count, prior
    // click-value sum, seconds since the last click — so no label
    // leakage. One window partitioned by user over (ts, event_id) with a
    // rows-preceding frame; value sums in exact cents. At 100 TB this is
    // one user-hash shuffle, the same cost as sessionization.
    Q("pit_feature_join",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val isClick = col("event_type") === "click"
        ev.withColumn("n_prior_clicks",
            count(when(isClick, 1)).over(w))
          .withColumn("prior_click_cents",
            coalesce(sum(when(isClick, round(col("value") * 100).cast("long")))
              .over(w), lit(0L)))
          .withColumn("last_click_ts", max(when(isClick, col("ts"))).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("n_prior_clicks"), col("prior_click_cents"),
            (unix_micros(col("ts")) - unix_micros(col("last_click_ts")))
              .cast("long").as("us_since_last_click"))
      },
      Some("""SELECT event_id, user_id, cast(ts AS TIMESTAMP) AS ts,
             |  cast(count(CASE WHEN event_type = 'click' THEN 1 END)
             |    OVER pw AS BIGINT) AS n_prior_clicks,
             |  cast(coalesce(sum(CASE WHEN event_type = 'click'
             |      THEN cast(round(value * 100) AS BIGINT) END) OVER pw, 0)
             |    AS BIGINT) AS prior_click_cents,
             |  cast(epoch_us(cast(ts AS TIMESTAMP))
             |    - epoch_us(max(CASE WHEN event_type = 'click'
             |        THEN cast(ts AS TIMESTAMP) END) OVER pw) AS BIGINT)
             |    AS us_since_last_click
             |FROM events
             |WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |QUALIFY event_type = 'purchase'""".stripMargin)),

    // NEGATIVE SAMPLING for retrieval training: per (query, hardest
    // positive) pair, K=3 distinct pseudo-random negatives drawn by
    // md5(query, draw) modulo the corpus — row-local, reproducible, and
    // collision-safe (6 draws, drop hits on the positive and duplicate
    // draws, keep the first 3 by draw index). Scale shape: the positive
    // set is bounded (one per query); the draw explode is 6× that; the
    // only windows partition by query over ≤6 rows.
    Q("negative_sampling",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = emb(s, dir)
        val corpusN = e.agg(max(col("vec_id"))).head().getLong(0) - 9L
        val pos = bruteTopK(s, dir, 1)
          .select(col("query_id"), col("neighbor_id").as("positive_id"))
        val cand = pos.select(col("query_id"), col("positive_id"),
            explode(sequence(lit(0), lit(5))).as("i"))
          .withColumn("neg_id", lit(10L) +
            pmod(conv(substring(md5(concat(lit("ns#"),
              col("query_id").cast("string"), lit(":"),
              col("i").cast("string"))), 1, 8), 16, 10).cast("long"),
              lit(corpusN)))
          .filter(col("neg_id") =!= col("positive_id"))
        val dedup = Window.partitionBy("query_id", "neg_id").orderBy("i")
        val rank = Window.partitionBy("query_id").orderBy("i")
        cand.withColumn("__d", row_number().over(dedup)).filter(col("__d") === 1)
          .withColumn("neg_rank", row_number().over(rank).cast("long"))
          .filter(col("neg_rank") <= 3)
          .select(col("query_id"), col("positive_id"), col("neg_rank"),
            col("neg_id"))
      },
      Some(s"""WITH n AS (SELECT max(vec_id) - 9 AS corpus_n FROM embeddings),
              |brute_scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM embeddings a JOIN embeddings b
              |    ON a.vec_id < 10 AND b.vec_id >= 10),
              |pos AS (
              |  SELECT query_id, neighbor_id AS positive_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
              |    FROM brute_scored) WHERE rn = 1),
              |cand AS (
              |  SELECT p.query_id, p.positive_id, r.i,
              |    10 + cast(('0x' || substr(md5('ns#'
              |      || cast(p.query_id AS VARCHAR) || ':'
              |      || cast(r.i AS VARCHAR)), 1, 8)) AS BIGINT) % n.corpus_n
              |      AS neg_id
              |  FROM pos p, range(0, 6) AS r(i), n
              |  WHERE 10 + cast(('0x' || substr(md5('ns#'
              |      || cast(p.query_id AS VARCHAR) || ':'
              |      || cast(r.i AS VARCHAR)), 1, 8)) AS BIGINT) % n.corpus_n
              |    <> p.positive_id),
              |dedup AS (
              |  SELECT * FROM cand
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id, neg_id
              |    ORDER BY i) = 1)
              |SELECT query_id, positive_id,
              |  cast(neg_rank AS BIGINT) AS neg_rank, neg_id
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY i) AS neg_rank FROM dedup)
              |WHERE neg_rank <= 3""".stripMargin)),

    // LABEL-PROPAGATION COMMUNITIES over the near-dup graph: two
    // synchronized rounds of "adopt the most frequent neighbor community,
    // ties → min id" from self-labels — the community detector that
    // complements connectedComponents (CC merges anything touching; LP
    // needs a plurality, so weak bridges don't fuse dense groups). Scale
    // shape per round: one equi-join of edges×labels + one
    // count-groupBy + one argmax-groupBy (both map-side combinable), no
    // window over unbounded partitions; isolated nodes keep their label
    // via the left join. All-integer arithmetic — no rounding anywhere.
    Q("label_propagation",
      (s, dir) => {
        val e = emb(s, dir).select(col("vec_id"), col("label"), col("embedding"))
          .withColumn("nrm", vecNorm(col("embedding")))
        val e2 = e.select(col("vec_id").as("vec_id_2"), col("label").as("label_2"),
          col("embedding").as("embedding_2"), col("nrm").as("nrm_2"))
        val pairs = e.hint("shuffle_hash")
          .join(e2, col("label") === col("label_2") && col("vec_id") < col("vec_id_2"))
          .filter(round(dotProduct(col("embedding"), col("embedding_2")) /
            (col("nrm") * col("nrm_2")), 4) >= 0.3)
          .select(col("vec_id").as("a"), col("vec_id_2").as("b"))
        val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
        val l0 = emb(s, dir).select(col("vec_id"), col("vec_id").as("comm"))
        def step(l: DataFrame): DataFrame = {
          val votes = edges
            .join(l.select(col("vec_id").as("src"), col("comm")), Seq("src"))
            .groupBy(col("dst"), col("comm")).agg(count(lit(1)).as("n"))
            .groupBy(col("dst"))
            .agg(max(struct(col("n"), (-col("comm")).as("nc"))).as("m"))
            .select(col("dst").as("vec_id"), (-col("m.nc")).as("new_comm"))
          l.join(votes, Seq("vec_id"), "left")
            .select(col("vec_id"),
              coalesce(col("new_comm"), col("comm")).as("comm"))
        }
        step(step(l0)).select(col("vec_id"), col("comm").as("community"))
      },
      Some(s"""WITH e0 AS (
              |  SELECT a.vec_id AS a, b.vec_id AS b
              |  FROM embeddings a JOIN embeddings b
              |    ON a.label = b.label AND a.vec_id < b.vec_id
              |  WHERE round(${cosDuck("a.embedding", "b.embedding")}, 4) >= 0.3),
              |edges AS (
              |  SELECT a AS src, b AS dst FROM e0
              |  UNION ALL SELECT b, a FROM e0),
              |l0 AS (SELECT vec_id, vec_id AS comm FROM embeddings),
              |c1 AS (
              |  SELECT e.dst AS vec_id, l.comm, count(*) AS n
              |  FROM edges e JOIN l0 l ON l.vec_id = e.src GROUP BY 1, 2),
              |p1 AS (
              |  SELECT vec_id, comm FROM c1
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
              |    ORDER BY n DESC, comm ASC) = 1),
              |l1 AS (
              |  SELECT l0.vec_id, coalesce(p1.comm, l0.comm) AS comm
              |  FROM l0 LEFT JOIN p1 USING (vec_id)),
              |c2 AS (
              |  SELECT e.dst AS vec_id, l.comm, count(*) AS n
              |  FROM edges e JOIN l1 l ON l.vec_id = e.src GROUP BY 1, 2),
              |p2 AS (
              |  SELECT vec_id, comm FROM c2
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
              |    ORDER BY n DESC, comm ASC) = 1)
              |SELECT l1.vec_id, coalesce(p2.comm, l1.comm) AS community
              |FROM l1 LEFT JOIN p2 USING (vec_id)""".stripMargin)),

    // LSH-bucketed ANN (the scale path): deterministic sign-random-projection
    // buckets from md5-derived hyperplanes; top-3 within bucket.
    // Hyperplane p(j,d) ∈ {-1,+1} = parity of md5(j:d).
    Q("ann_lsh_bucketed",
      (s, dir) => lshTopK(s, dir, 3),
      Some(s"""WITH planes AS (
             |  SELECT j, list_transform(range(0, 64),
             |    d -> cast(cast(('0x' || substr(md5(cast(j AS varchar) || ':' || cast(d AS varchar)), 1, 4)) AS BIGINT) % 2 AS double) * 2 - 1) AS p
             |  FROM range(0, 6) AS r(j)),
             |bucketed AS (
             |  SELECT e.vec_id, e.embedding,
             |    cast(sum(CASE WHEN list_sum(list_transform(list_zip(e.embedding, p.p),
             |               s -> cast(s[1] AS double) * s[2])) > 0
             |             THEN cast(pow(2, p.j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM embeddings e, planes p GROUP BY e.vec_id, e.embedding),
             |cands AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    round(${cosDuck("q.embedding", "c.embedding")}, 4) AS cos_sim
             |  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket
             |    AND q.vec_id < 10 AND c.vec_id >= 10),
             |ranked AS (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM cands)
             |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3""".stripMargin)),

    // IVF-cell ANN: the centroid index is DRIVER-HELD metadata (as in any
    // real IVF index) — K deterministic centroid vectors, every corpus
    // vector assigned to its nearest cell (argmax cosine, rounded to kill
    // cross-engine double jitter), queries probe their nprobe best cells
    // and score exactly within them. The corpus-side work is one codegen'd
    // K-wide dot-product projection + an equi-join on cell — no all-pairs.
    // recall@3 of the LSH ANN against brute-force ground truth — the
    // evaluation step a real similarity pipeline runs before trusting an
    // index. Per query: |approx ∩ true| / |true|. Both pipelines are
    // deterministic, so the metric itself is oracle-checkable.
    // MATRYOSHKA truncation eval: retrieve with only the FIRST 16 of 64
    // dims (the MRL deployment trick — prefix dims carry the coarse
    // structure, so a truncated index is 4× cheaper) and measure
    // recall@3 against full-dim ground truth. Same broadcast-queries /
    // stream-corpus shape as the other recall evals; the slice is a
    // zero-copy array prefix in both engines.
    Q("matryoshka_recall",
      (s, dir) => {
        val prefix = 16
        def topK(dims: Column => Column, k: Int): DataFrame = {
          val e = emb(s, dir)
            .select(col("vec_id"), dims(col("embedding")).as("v"))
            .withColumn("nrm", vecNorm(col("v")))
          val q = e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("v").as("qv"),
              col("nrm").as("qn"))
          val scored = broadcast(q).join(e.filter(col("vec_id") >= 10))
            .select(col("query_id"), col("vec_id").as("neighbor_id"),
              round(dotProduct(col("qv"), col("v")) / (col("qn") * col("nrm")), 4)
                .as("cos_sim"))
          topKByScore(scored, k, "cos_sim").select("query_id", "neighbor_id")
        }
        val truth = topK(identity, 3)
        val truncated = topK(v => slice(v, 1, prefix), 3)
          .withColumn("__hit", lit(1L))
        truth.join(truncated, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
          .withColumn("recall_at_3",
            col("n_found").cast("double") / col("n_true"))
      },
      Some(s"""WITH scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cs_full,
              |    round(${cosDuck("a.embedding[1:16]", "b.embedding[1:16]")}, 4)
              |      AS cs_trunc
              |  FROM embeddings a JOIN embeddings b
              |    ON a.vec_id < 10 AND b.vec_id >= 10),
              |truth AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cs_full DESC, neighbor_id ASC) AS r FROM scored)
              |  WHERE r <= 3),
              |trunc AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cs_trunc DESC, neighbor_id ASC) AS r FROM scored)
              |  WHERE r <= 3)
              |SELECT t.query_id, cast(count(*) AS BIGINT) AS n_true,
              |  cast(count(x.neighbor_id) AS BIGINT) AS n_found,
              |  cast(count(x.neighbor_id) AS double) / count(*) AS recall_at_3
              |FROM truth t LEFT JOIN trunc x
              |  ON x.query_id = t.query_id AND x.neighbor_id = t.neighbor_id
              |GROUP BY t.query_id""".stripMargin)),

    Q("ann_recall",
      (s, dir) => {
        val truth = bruteTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
        val approx = lshTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1L))
        truth.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
          .withColumn("recall_at_3",
            col("n_found").cast("double") / col("n_true"))
      },
      Some(s"""WITH planes AS (
             |  SELECT j, list_transform(range(0, 64),
             |    d -> cast(cast(('0x' || substr(md5(cast(j AS varchar) || ':' || cast(d AS varchar)), 1, 4)) AS BIGINT) % 2 AS double) * 2 - 1) AS p
             |  FROM range(0, 6) AS r(j)),
             |bucketed AS (
             |  SELECT e.vec_id, e.embedding,
             |    cast(sum(CASE WHEN list_sum(list_transform(list_zip(e.embedding, p.p),
             |               s -> cast(s[1] AS double) * s[2])) > 0
             |             THEN cast(pow(2, p.j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM embeddings e, planes p GROUP BY e.vec_id, e.embedding),
             |lsh_cands AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    round(${cosDuck("q.embedding", "c.embedding")}, 4) AS cos_sim
             |  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket
             |    AND q.vec_id < 10 AND c.vec_id >= 10),
             |lsh AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM lsh_cands)
             |  WHERE rank <= 3),
             |brute_scored AS (
             |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
             |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10),
             |brute AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM brute_scored)
             |  WHERE rank <= 3)
             |SELECT b.query_id, cast(count(*) AS BIGINT) AS n_true,
             |  cast(count(l.neighbor_id) AS BIGINT) AS n_found,
             |  cast(count(l.neighbor_id) AS double) / count(*) AS recall_at_3
             |FROM brute b LEFT JOIN lsh l
             |  ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
             |GROUP BY b.query_id""".stripMargin)),

    // CODEBOOK AS DATA, NOT PLAN: the other IVF/PQ queries drive their
    // centroids through driver-collected typedLit literals — exact, and
    // right at nlist=8, but the expression tree grows with the codebook,
    // and at the production nlist ≈ √N (thousands of centroids × 64
    // floats) plan size becomes the limit. This query runs the SAME
    // deterministic cell assignment with the codebook kept as a DATAFRAME
    // end to end: corpus ⋈ broadcast(centroids) (tiny build side), one
    // rounded cosine per pair, argmax via max(struct) — zero driver
    // collects, plan size O(1) in nlist, the shape that survives a
    // trained 4096-cell index. The emitted census (cell cardinality +
    // how many queries probe each cell at nprobe=2) pins the assignment
    // exactly against the oracle's QUALIFY formulation.
    Q("ann_codebook_join",
      (s, dir) => {
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
        val cents = e.filter(col("vec_id") >= 10 && col("vec_id") < 18)
          .select((col("vec_id") - 10).as("cid"), col("embedding").as("cvec"),
            col("nrm").as("cnrm"))
        val scored = e.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cid"),
            round(dotProduct(col("embedding"), col("cvec")) /
              (col("nrm") * col("cnrm")), 4).as("s"))
        val corpusCell = scored.filter(col("vec_id") >= 10)
          .groupBy(col("vec_id"))
          .agg(max(struct(col("s"), (-col("cid")).as("nc"))).as("b"))
          .select(col("vec_id"), (-col("b.nc")).cast("long").as("cell"))
        val wq = Window.partitionBy(col("vec_id"))
          .orderBy(col("s").desc, col("cid").asc)
        val queryCells = scored.filter(col("vec_id") < 10)
          .withColumn("__rn", row_number().over(wq)).filter(col("__rn") <= 2)
          .select(col("vec_id").as("query_id"), col("cid").cast("long").as("cell"))
        corpusCell.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_members"))
          .join(queryCells.groupBy(col("cell")).agg(count(lit(1)).as("n_probes")),
            Seq("cell"), "left")
          .select(col("cell"), col("n_members"),
            coalesce(col("n_probes"), lit(0L)).as("n_probes"))
      },
      Some(s"""WITH icent AS (
             |  SELECT vec_id - 10 AS cid, embedding AS cvec
             |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 18),
             |iscored AS (
             |  SELECT e.vec_id, c.cid,
             |    round(${cosDuck("e.embedding", "c.cvec")}, 4) AS s
             |  FROM embeddings e, icent c),
             |corpus_cell AS (
             |  SELECT vec_id, cid AS cell FROM iscored WHERE vec_id >= 10
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
             |    ORDER BY s DESC, cid ASC) = 1),
             |query_cells AS (
             |  SELECT vec_id AS query_id, cid AS cell FROM iscored
             |  WHERE vec_id < 10
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
             |    ORDER BY s DESC, cid ASC) <= 2)
             |SELECT m.cell, m.n_members, coalesce(q.n_probes, 0) AS n_probes
             |FROM (SELECT cast(cell AS BIGINT) AS cell,
             |        cast(count(*) AS BIGINT) AS n_members
             |      FROM corpus_cell GROUP BY 1) m
             |LEFT JOIN (SELECT cast(cell AS BIGINT) AS cell,
             |             cast(count(*) AS BIGINT) AS n_probes
             |           FROM query_cells GROUP BY 1) q USING (cell)""".stripMargin)),

    Q("ivf_ann",
      (s, dir) => {
        val k = 8; val nprobe = 2
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
        // deterministic centroids: the first K corpus vectors (centroid
        // QUALITY is irrelevant to the mechanics; a trained index would
        // swap in k-means means here), kept AS DATA (ivfCents) so the
        // plan is O(1) in nlist — see ann_codebook_join for the rationale
        val cents = ivfCents(e, k)
        val scoredAll = ivfScores(e, cents)
        val corpus = ivfAssign(scoredAll.filter(col("vec_id") >= 10))
        import org.apache.spark.sql.expressions.Window
        val wq = Window.partitionBy(col("vec_id"))
          .orderBy(col("s").desc, col("cid").asc)
        val probed = scoredAll.filter(col("vec_id") < 10)
          .withColumn("__rn", row_number().over(wq))
          .filter(col("__rn") <= nprobe)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qn"), col("cid").as("cell"))
        val cands = broadcast(probed).join(corpus, Seq("cell"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(dotProduct(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 4).as("cos_sim"))
        topKByScore(cands, 3, "cos_sim")
      },
      Some(s"""WITH cent AS (
              |  SELECT vec_id - 10 AS cid, embedding AS cvec
              |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 18),
              |scored AS (
              |  SELECT e.vec_id, c.cid,
              |    round(${cosDuck("e.embedding", "c.cvec")}, 4) AS s
              |  FROM embeddings e, cent c),
              |corpus_cell AS (
              |  SELECT vec_id, cid AS cell FROM scored WHERE vec_id >= 10
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) = 1),
              |query_cells AS (
              |  SELECT vec_id AS query_id, cid AS cell FROM scored WHERE vec_id < 10
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) <= 2),
              |cands AS (
              |  SELECT q.query_id, c.vec_id AS neighbor_id,
              |    round(${cosDuck("qe.embedding", "ce.embedding")}, 4) AS cos_sim
              |  FROM query_cells q JOIN corpus_cell c ON q.cell = c.cell
              |  JOIN embeddings qe ON qe.vec_id = q.query_id
              |  JOIN embeddings ce ON ce.vec_id = c.vec_id),
              |ranked AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM cands)
              |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3""".stripMargin)),

    // IVF with the codebook as a broadcast TABLE, not plan literals —
    // the real-nlist shape. `ivf_ann` inlines ≤8 centroid vectors as
    // typedLit expressions, which is ideal at toy nlist but grows the
    // PLAN (and codegen size) linearly with nlist; at a production
    // nlist ≈ √N the codebook must be DATA. Here assignment is
    // corpus × broadcast(centroid table) → per-pair cosine → per-vector
    // argmax via one bounded window (nlist rows per vector, partitioned
    // by vec_id — never global). Probing and re-ranking are unchanged.
    // Same oracle chain as ivf_ann at nlist=32, nprobe=4.
    Q("ivf_bcast_ann",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nlist = 32; val nprobe = 4
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
        val cent = e.filter(col("vec_id") >= 10 && col("vec_id") < 10 + nlist)
          .select((col("vec_id") - 10).as("cid"),
            col("embedding").as("cvec"), col("nrm").as("cn"))
        val paired = e.crossJoin(broadcast(cent))
          .withColumn("s", round(dotProduct(col("embedding"), col("cvec")) /
            (col("nrm") * col("cn")), 4))
        // corpus argmax: max(struct(s, -cid)) ≡ ORDER BY s DESC, cid ASC
        // LIMIT 1 — a partially-aggregated groupBy, so the corpus×nlist
        // pair stream collapses map-side instead of window-sorting (the
        // same argmax shape ann_codebook_join pins)
        val corpus = paired.filter(col("vec_id") >= 10)
          .groupBy(col("vec_id"))
          .agg(max(struct(col("s"), (-col("cid")).as("nc"))).as("b"),
            first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
          .select(col("vec_id"), col("embedding"), col("nrm"),
            (-col("b.nc")).as("cell"))
        val byVec = Window.partitionBy(col("vec_id"))
          .orderBy(col("s").desc, col("cid").asc)
        val probed = paired.filter(col("vec_id") < 10)
          .withColumn("__rn", row_number().over(byVec))
          .filter(col("__rn") <= nprobe)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qn"), col("cid").as("cell"))
        val cands = broadcast(probed).join(corpus, Seq("cell"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(dotProduct(col("qv"), col("embedding")) /
              (col("qn") * col("nrm")), 4).as("cos_sim"))
        topKByScore(cands, 3, "cos_sim")
      },
      Some(s"""WITH cent AS (
              |  SELECT vec_id - 10 AS cid, embedding AS cvec
              |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 42),
              |scored AS (
              |  SELECT e.vec_id, c.cid,
              |    round(${cosDuck("e.embedding", "c.cvec")}, 4) AS s
              |  FROM embeddings e, cent c),
              |corpus_cell AS (
              |  SELECT vec_id, cid AS cell FROM scored WHERE vec_id >= 10
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) = 1),
              |query_cells AS (
              |  SELECT vec_id AS query_id, cid AS cell FROM scored WHERE vec_id < 10
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) <= 4),
              |cands AS (
              |  SELECT q.query_id, c.vec_id AS neighbor_id,
              |    round(${cosDuck("qe.embedding", "ce.embedding")}, 4) AS cos_sim
              |  FROM query_cells q JOIN corpus_cell c ON q.cell = c.cell
              |  JOIN embeddings qe ON qe.vec_id = q.query_id
              |  JOIN embeddings ce ON ce.vec_id = c.vec_id),
              |ranked AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM cands)
              |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3""".stripMargin)),

    // tumbling-window aggregation over the events stream table (see
    // `events` for the schema-adaptive ts normalization).
    Q("events_windowed",
      (s, dir) => {
        val ev = events(s, dir)
        ev.groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Volume-anomaly detection: each (event_type, hour) count is z-scored
    // against its own TRAILING 24-hour window (mean + population stddev,
    // rows -24..-1), flagged when z ≥ 3 — the monitoring shape that
    // catches an ingest spike or a dead producer per stream. The window
    // partitions by event_type, so after the one hourly pre-aggregation
    // (map-side combined) the operator shuffles #types × #hours ROWS —
    // independent of raw event volume; at 100 TB the window input is tiny.
    // Warm-up rows (< 6 trailing hours) are suppressed: a 2-point baseline
    // flagging everything as anomalous is noise, not monitoring. z is
    // rounded before the ≥3 flag so Spark and the oracle gate on the same
    // 4-dp value (stddev algorithms differ in final ulps).
    Q("event_spike_detection",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
        val hourly = ev.groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(-24, -1)
        hourly
          .withColumn("baseline_n", count(col("n")).over(w))
          .withColumn("baseline_mean", avg(col("n")).over(w))
          .withColumn("baseline_std", stddev_pop(col("n")).over(w))
          .filter(col("baseline_n") >= 6)
          .withColumn("z", round(try_divide(
            col("n") - col("baseline_mean"), col("baseline_std")), 4))
          .select(col("event_type"), col("hour"), col("n"),
            round(col("baseline_mean"), 4).as("baseline_mean"),
            round(col("baseline_std"), 4).as("baseline_std"),
            col("z"), (col("z") >= 3.0).as("spike"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS hour,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |win AS (
             |  SELECT event_type, hour, n,
             |    count(n) OVER tw AS baseline_n,
             |    avg(n) OVER tw AS baseline_mean,
             |    stddev_pop(n) OVER tw AS baseline_std
             |  FROM hourly
             |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour
             |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
             |z AS (
             |  SELECT event_type, hour, cast(n AS BIGINT) AS n,
             |    round(baseline_mean, 4) AS baseline_mean,
             |    round(baseline_std, 4) AS baseline_std,
             |    round((n - baseline_mean) / nullif(baseline_std, 0), 4) AS z
             |  FROM win WHERE baseline_n >= 6)
             |SELECT *, z >= 3.0 AS spike FROM z""".stripMargin)),

    // gap-based sessionization: a session breaks when a user is idle for
    // more than 30 minutes — LAG marks the breaks, a running SUM of break
    // flags assigns session numbers, one aggregate emits per-session
    // metrics. Everything partitions by user_id, so the whole operator is
    // two windows and one groupBy over the same user-hash shuffle — one
    // exchange total, embarrassingly parallel across users at any scale.
    // first-order Markov TRANSITION matrix over per-user event sequences —
    // the behavioral-model / anomaly-baseline primitive (which step
    // follows which, with conditional probabilities). One lag window per
    // user (ts + event_id tiebreak, same determinism contract as
    // event_sessions), one count aggregate, one per-prev share window over
    // the #event_types² matrix — raw events shuffle once by user_id and
    // never again; the matrix itself is tiny at any corpus scale.
    Q("event_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val t = ev.withColumn("prev_type",
          coalesce(lag(col("event_type"), 1).over(byUser), lit("_start")))
        t.groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n") /
            sum(col("n")).over(Window.partitionBy("prev_type")), 6))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, cast(ts AS TIMESTAMP) AS ts, event_type
             |  FROM events),
             |t AS (
             |  SELECT coalesce(lag(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id),
             |    '_start') AS prev_type, event_type
             |  FROM ev),
             |c AS (
             |  SELECT prev_type, event_type, count(*) AS n
             |  FROM t GROUP BY prev_type, event_type)
             |SELECT prev_type, event_type, n,
             |  round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
             |FROM c""".stripMargin)),

    Q("event_sessions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val gapMin = 30
        val ev = events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        // event_id tiebreak: equal timestamps must order identically in
        // both engines or the LAG sees different neighbors; gaps compare
        // in MICROSECONDS so sub-second differences can't straddle the
        // threshold differently under truncation
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val flagged = ev.withColumn("__brk",
          when(unix_micros(col("ts")) -
            lag(unix_micros(col("ts")), 1).over(byUser) > gapMin * 60000000L, 1L)
            .otherwise(0L))
          .withColumn("session_no", sum(col("__brk")).over(byUser))
        flagged.groupBy(col("user_id"), col("session_no"))
          .agg(min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 4).as("session_value"))
      },
      Some("""WITH ev AS (
             |  -- microsecond precision matches the normalized Spark ts
             |  -- (SimQueries.events): emitted session bounds must
             |  -- truncate identically, not only the gap comparison
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
             |SELECT user_id, session_no,
             |  min(ts) AS session_start, max(ts) AS session_end,
             |  cast(count(*) AS BIGINT) AS n_events,
             |  round(sum(value), 4) AS session_value
             |FROM numbered GROUP BY user_id, session_no""".stripMargin)),

    // semi-structured props: typed JSON extraction (from_json with an
    // explicit schema — codegen'd, no UDF) feeding an aggregation. On the
    // Spark side parse errors become typed NULLs, not exceptions. NOTE the
    // oracle equivalence is scoped to clean numeric props (the generator's
    // format): engines coerce DIRTY values differently (a string-encoded
    // "5" is NULL under from_json's strict LongType but 5 under a SQL
    // CAST), so a dirty-data pipeline should assert Spark-side semantics
    // in a spec rather than cross-engine.
    Q("events_props_json",
      (s, dir) => {
        val ev = events(s, dir)
        ev.select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
          .groupBy("event_type")
          .agg(count(col("k")).as("n_parsed"),
            sum(col("k")).as("k_total"),
            min(col("k")).as("k_min"),
            max(col("k")).as("k_max"))
      },
      Some("""SELECT event_type,
             |  cast(count(try_cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_parsed,
             |  cast(sum(try_cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_total,
             |  cast(min(try_cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_min,
             |  cast(max(try_cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max
             |FROM events GROUP BY event_type""".stripMargin)),

    // retention cohorts: users grouped by first-seen week, activity counted
    // per (cohort week, active week) cell. Two aggregations over the same
    // user-hash shuffle — the first-seen table re-joins as a broadcast
    // (users ≪ events at any scale).
    Q("retention_cohorts",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        val firstSeen = ev.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"))
        ev.join(broadcast(firstSeen), Seq("user_id"))
          .groupBy("cohort_week", "week")
          .agg(countDistinct(col("user_id")).as("n_active_users"))
          .withColumn("weeks_since_cohort",
            expr("datediff(week, cohort_week) div 7").cast("long"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, date_trunc('week', cast(ts AS TIMESTAMP)) AS week
             |  FROM events),
             |first_seen AS (
             |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
             |SELECT f.cohort_week, e.week,
             |  cast(count(DISTINCT e.user_id) AS BIGINT) AS n_active_users,
             |  cast(date_diff('day', cast(f.cohort_week AS DATE), cast(e.week AS DATE)) // 7
             |    AS BIGINT) AS weeks_since_cohort
             |FROM ev e JOIN first_seen f ON e.user_id = f.user_id
             |GROUP BY f.cohort_week, e.week""".stripMargin)),

    // ordered funnel: view → click → purchase, each step's first occurrence
    // must FOLLOW the previous step's. One groupBy collapses each user to
    // three first-occurrence timestamps (partial-aggregating min per step),
    // then the step comparisons are a pure projection — no self-joins, no
    // windows, one shuffle total for any number of steps.
    Q("funnel_conversion",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
        def firstOf(t: String) = min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
        val perUser = ev.groupBy("user_id")
          .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
        val step1 = col("t_view").isNotNull
        val step2 = step1 && col("t_click") > col("t_view")
        val step3 = step2 && col("t_purchase") > col("t_click")
        perUser.agg(
          count(lit(1)).as("n_users"),
          sum(step1.cast("long")).as("n_viewed"),
          sum(step2.cast("long")).as("n_clicked_after_view"),
          sum(step3.cast("long")).as("n_purchased_after_click"))
      },
      Some("""WITH per_user AS (
             |  -- microsecond cast mirrors Spark's normalized ts (see
             |  -- event_sessions): step comparisons must truncate alike
             |  SELECT user_id,
             |    min(cast(ts AS TIMESTAMP)) FILTER (event_type = 'view') AS t_view,
             |    min(cast(ts AS TIMESTAMP)) FILTER (event_type = 'click') AS t_click,
             |    min(cast(ts AS TIMESTAMP)) FILTER (event_type = 'purchase') AS t_purchase
             |  FROM events GROUP BY user_id)
             |SELECT cast(count(*) AS BIGINT) AS n_users,
             |  cast(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_viewed,
             |  cast(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
             |  cast(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
             |    AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_purchased_after_click
             |FROM per_user""".stripMargin)),

    // last-touch click→purchase attribution: for each purchase, the most
    // recent click by the same user within the preceding hour. Scale
    // shape: an EQUI-join on user_id (both sides shuffle-partitioned by
    // user — never a cross or theta-only join) with the time window as a
    // residual join filter, then a per-purchase argmax via max(struct) —
    // map-side combinable partial aggregation, no window sort. The same
    // pair-generation predicate runs streaming as
    // [[graft.streaming.StreamingLoaders.attributionJoinStream]].
    Q("click_attribution",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        purchases.join(clicks, Seq("user_id"))
          .filter(col("click_ts") <= col("purchase_ts") &&
            col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
          .groupBy(col("purchase_id"), col("user_id"), col("purchase_ts"))
          .agg(max(struct(col("click_ts"), col("click_id"))).as("m"))
          .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
            col("m.click_id").as("click_id"), col("m.click_ts").as("click_ts"),
            (unix_micros(col("purchase_ts")) - unix_micros(col("m.click_ts")))
              .as("us_before"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_id AS click_id,
             |    cast(ts AS TIMESTAMP) AS click_ts
             |  FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id, event_id AS purchase_id,
             |    cast(ts AS TIMESTAMP) AS purchase_ts
             |  FROM events WHERE event_type = 'purchase'),
             |j AS (
             |  SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_id,
             |    c.click_ts
             |  FROM p JOIN c ON c.user_id = p.user_id
             |  WHERE c.click_ts <= p.purchase_ts
             |    AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY purchase_id
             |    ORDER BY click_ts DESC, click_id DESC) AS rn FROM j)
             |SELECT purchase_id, user_id, purchase_ts, click_id, click_ts,
             |  epoch_us(purchase_ts) - epoch_us(click_ts) AS us_before
             |FROM r WHERE rn = 1""".stripMargin)),

    // mergeable sketch table: per-(event_type, day) HLL sketches re-
    // aggregated WITHOUT raw data — the incremental-monitoring shape at
    // 100 TB, where a daily job persists one fixed-size blob per group and
    // any rollup window (week, month, all-time) is a union over blobs
    // instead of a rescan of the raw ids. Complements `cardinality_sketch`
    // (a one-shot approx_count_distinct): here the sketch is DATA — built
    // once, stored, merged later — which is what makes distinct-count
    // monitoring O(groups) instead of O(events) per report. HLL register
    // maxima are merge-order-independent, so the estimate is deterministic
    // and the tolerance boolean is a stable oracle column.
    Q("hll_sketch_rollup",
      (s, dir) => {
        val ev = events(s, dir)
          .withColumn("day", to_date(col("ts")))
        // stage 1: the persisted artifact — one 2^12-register sketch per
        // (event_type, day); partial-aggregates map-side like any agg
        val daily = ev.groupBy("event_type", "day")
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
        // stage 2: the rollup a report would run — union over blobs only
        val rolled = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            expr("hll_sketch_estimate(hll_union_agg(sk))").as("n_est"))
        val exact = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"))
        rolled.join(exact, Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("n_exact"),
            (abs(col("n_est") - col("n_exact")).cast("double") <=
              lit(0.05) * col("n_exact")).as("est_within_5pct"))
      },
      Some("""SELECT event_type,
             |  count(DISTINCT date_trunc('day', ts)) AS n_days,
             |  count(DISTINCT user_id) AS n_exact,
             |  true AS est_within_5pct
             |FROM events GROUP BY event_type""".stripMargin)),

    // SLIDING-window aggregation (1h window / 15min slide): each event
    // lands in exactly window÷slide = 4 overlapping windows. Spark's
    // window() expands the 4 window structs per row BEFORE the
    // aggregation, so this is ONE exchange carrying 4× rows with map-side
    // partial aggregation — no self-join, no window function, no
    // per-window rescan; at 100 TB the cost is the same single shuffle as
    // a tumbling groupBy, scaled by the overlap factor. The oracle
    // replicates rows against range(4) with the same epoch-aligned
    // bucket arithmetic Spark uses.
    Q("event_sliding_window",
      (s, dir) => {
        val ev = events(s, dir)
        ev.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 4).as("total_value"))
          .select(col("w.start").as("window_start"),
            col("w.end").as("window_end"), col("event_type"),
            col("n_events"), col("total_value"))
      },
      Some("""WITH ev AS (
             |  SELECT cast(ts AS TIMESTAMP) AS ts, event_type, value
             |  FROM events),
             |wins AS (
             |  SELECT make_timestamp((epoch_us(ts) // 900000000 - t.k)
             |      * 900000000) AS window_start, event_type, value
             |  FROM ev CROSS JOIN range(4) t(k))
             |SELECT window_start,
             |  window_start + INTERVAL 1 HOUR AS window_end,
             |  event_type, cast(count(*) AS BIGINT) AS n_events,
             |  round(sum(value), 4) AS total_value
             |FROM wins GROUP BY window_start, event_type""".stripMargin)),

    // SLIDING-window EXACT DISTINCT (trailing-7-day active users per
    // day) — the aggregate sliding windows can't partial-aggregate and
    // the naive shapes rescan the fact table per window (7-way self-join)
    // or funnel everything into one task (global window + set state).
    // Scale shape: dedup to (user, day) FIRST — the only full-data
    // shuffle — then each (user, day) contributes to ≤7 output days via
    // a bounded sequence-explode ON THE DEDUPED GRAIN, then one exact
    // distinct-count per day. Output days pinned to observed event days
    // (broadcast semi-join) so both engines agree on the domain.
    Q("sliding_distinct_users",
      (s, dir) => {
        val ud = events(s, dir)
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val days = ud.select(col("d").as("day")).distinct()
        ud.select(explode(expr("sequence(d, date_add(d, 6))")).as("day"),
            col("user_id"))
          .join(broadcast(days), Seq("day"), "left_semi")
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("active_users_7d"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT cast(ts AS DATE) AS d, user_id FROM events),
             |days AS (SELECT DISTINCT d AS day FROM ud)
             |SELECT dy.day, count(DISTINCT u.user_id) AS active_users_7d
             |FROM days dy
             |JOIN ud u ON u.d BETWEEN dy.day - INTERVAL 6 DAY AND dy.day
             |GROUP BY 1""".stripMargin)),

    // sliding distinct via MERGEABLE SKETCHES — the 100 TB path beside
    // the exact query above: one HLL sketch per day (O(day's users)
    // once), then the trailing-7 merge unions 7 fixed-size sketches per
    // output day (O(days × 7), independent of user count) —
    // hll_union_agg over the same bounded day-explode. The oracle pins
    // the day domain, the EXACT count, and a ±5% accuracy envelope on
    // the estimate (the sketch itself is engine-specific, its accuracy
    // contract is not).
    Q("sliding_distinct_sketch",
      (s, dir) => {
        val ud = events(s, dir)
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val days = ud.select(col("d").as("day")).distinct()
        val daily = ud.groupBy("d")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        val est = daily
          .select(explode(expr("sequence(d, date_add(d, 6))")).as("day"),
            col("sk"))
          .join(broadcast(days), Seq("day"), "left_semi")
          .groupBy(col("day"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        val exact = ud
          .select(explode(expr("sequence(d, date_add(d, 6))")).as("day"),
            col("user_id"))
          .join(broadcast(days), Seq("day"), "left_semi")
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("exact_users_7d"))
        est.join(exact, Seq("day"))
          .select(col("day"), col("exact_users_7d"),
            (abs(col("est") - col("exact_users_7d")).cast("double") <=
              lit(0.05) * col("exact_users_7d")).as("est_within_5pct"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT cast(ts AS DATE) AS d, user_id FROM events),
             |days AS (SELECT DISTINCT d AS day FROM ud)
             |SELECT dy.day, count(DISTINCT u.user_id) AS exact_users_7d,
             |  true AS est_within_5pct
             |FROM days dy
             |JOIN ud u ON u.d BETWEEN dy.day - INTERVAL 6 DAY AND dy.day
             |GROUP BY 1""".stripMargin)),

    // NEW vs RETURNING decomposition with lifetime running total: a
    // user's first-ever active day marks them new; every later active
    // day is returning. One (user, day) dedup, one per-user min, one
    // per-day aggregate; the cumulative-users series is a global window
    // over the day grain (~30 rows — bounded by construction, audited).
    Q("new_vs_returning",
      (s, dir) => {
        val ud = events(s, dir)
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val first = ud.groupBy("user_id").agg(min("day").as("first_day"))
        val daily = ud.join(first, Seq("user_id"))
          .groupBy("day")
          .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("n_new"),
            sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
              .as("n_returning"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.withColumn("cumulative_users", sum(col("n_new")).over(w))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT cast(ts AS DATE) AS day, user_id FROM events),
             |first AS (
             |  SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
             |daily AS (
             |  SELECT day,
             |    cast(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_new,
             |    cast(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_returning
             |  FROM ud JOIN first USING (user_id) GROUP BY 1)
             |SELECT day, n_new, n_returning,
             |  cast(sum(n_new) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cumulative_users
             |FROM daily""".stripMargin)),

    // SWEEP-LINE PEAK CONCURRENCY: each event opens a 15-minute presence
    // interval; the day's peak number of simultaneously-open intervals
    // (among sessions STARTED that day — both boundaries attributed to
    // the start day, so each day's sweep is self-contained and
    // deterministic) is the classic +1/−1 boundary sweep: explode to 2
    // boundary rows, collapse per instant (no tie-order ambiguity), one
    // running sum per day partition, max. O(2n) rows and a partitioned
    // window — never an interval self-join (quadratic on busy days).
    Q("concurrent_sessions_peak",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("ts").cast("timestamp").as("a"))
          .withColumn("b", col("a") + expr("INTERVAL 15 MINUTES"))
          .withColumn("day", to_date(col("a")))
        val bounds = ev.select(col("day"), col("a").as("t"),
            lit(1L).as("st"), lit(0L).as("en"))
          .unionByName(ev.select(col("day"), col("b").as("t"),
            lit(0L).as("st"), lit(1L).as("en")))
        val inst = bounds.groupBy("day", "t")
          .agg(sum("st").as("starts"), sum("en").as("ends"))
        val w = Window.partitionBy("day").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        inst.withColumn("conc", sum(col("starts") - col("ends")).over(w))
          .groupBy("day")
          .agg(max("conc").as("peak_concurrency"),
            sum("starts").as("n_sessions"))
      },
      Some("""WITH iv AS (
             |  SELECT cast(ts AS TIMESTAMP) AS a,
             |    cast(ts AS TIMESTAMP) + INTERVAL 15 MINUTE AS b,
             |    cast(ts AS DATE) AS day
             |  FROM events),
             |bounds AS (
             |  SELECT day, a AS t, 1 AS st, 0 AS en FROM iv
             |  UNION ALL
             |  SELECT day, b AS t, 0 AS st, 1 AS en FROM iv),
             |inst AS (
             |  SELECT day, t, sum(st) AS starts, sum(en) AS ends
             |  FROM bounds GROUP BY 1, 2),
             |swept AS (
             |  SELECT day, starts, sum(starts - ends) OVER (
             |    PARTITION BY day ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
             |  FROM inst)
             |SELECT day, cast(max(conc) AS BIGINT) AS peak_concurrency,
             |  cast(sum(starts) AS BIGINT) AS n_sessions
             |FROM swept GROUP BY 1""".stripMargin)),

    // inter-event DWELL TIME per event type: gap from each event to the
    // same user's previous event (any type), aggregated from EXACT
    // integer microsecond sums — the mean is sum÷count over int64, so the
    // result is order-independent and engine-exact (no floating
    // accumulation). One user-hash shuffle for the LAG, one groupBy.
    Q("event_dwell_time",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gaps = ev.withColumn("gap_us",
            unix_micros(col("ts")) -
              lag(unix_micros(col("ts")), 1).over(byUser))
          .filter(col("gap_us").isNotNull)
        gaps.groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            sum(col("gap_us")).as("sum_us"),
            min(col("gap_us")).as("min_gap_us"),
            max(col("gap_us")).as("max_gap_us"))
          .select(col("event_type"), col("n_gaps"),
            round(col("sum_us").cast("double") / col("n_gaps") / 1e6, 4)
              .as("mean_gap_s"),
            col("min_gap_us"), col("max_gap_us"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, cast(ts AS TIMESTAMP) AS ts,
             |    event_type
             |  FROM events),
             |g AS (
             |  SELECT event_type,
             |    epoch_us(ts) - epoch_us(lag(ts) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
             |  FROM ev)
             |SELECT event_type, cast(count(*) AS BIGINT) AS n_gaps,
             |  round(cast(sum(gap_us) AS double) / count(*) / 1e6, 4)
             |    AS mean_gap_s,
             |  cast(min(gap_us) AS BIGINT) AS min_gap_us,
             |  cast(max(gap_us) AS BIGINT) AS max_gap_us
             |FROM g WHERE gap_us IS NOT NULL
             |GROUP BY event_type""".stripMargin)),

    // per-user lifetime-value EXACT quantiles — the calibration baseline
    // for the mergeable-sketch path (`kll_quantile_rollup` is the 100 TB
    // shape; exact interpolated percentiles need every per-user total on
    // one reducer, O(distinct values) memory). The per-user totals are
    // rounded to 6 dp BEFORE the quantile so both engines interpolate
    // over identical inputs; Spark `percentile` and DuckDB
    // `quantile_cont` share the p·(n−1) linear-interpolation definition.
    Q("user_value_quantiles",
      (s, dir) => {
        val perUser = events(s, dir).groupBy("user_id")
          .agg(round(sum(col("value")), 6).as("ltv"))
        perUser
          .agg(count(lit(1)).as("n_users"),
            expr("percentile(ltv, array(0.25D,0.5D,0.75D,0.9D,0.99D))").as("ps"))
          .select(col("n_users"),
            round(col("ps")(0), 4).as("p25"), round(col("ps")(1), 4).as("p50"),
            round(col("ps")(2), 4).as("p75"), round(col("ps")(3), 4).as("p90"),
            round(col("ps")(4), 4).as("p99"))
      },
      Some("""WITH pu AS (
             |  SELECT user_id, round(sum(value), 6) AS ltv
             |  FROM events GROUP BY user_id)
             |SELECT cast(count(*) AS BIGINT) AS n_users,
             |  round(quantile_cont(ltv, 0.25), 4) AS p25,
             |  round(quantile_cont(ltv, 0.5), 4) AS p50,
             |  round(quantile_cont(ltv, 0.75), 4) AS p75,
             |  round(quantile_cont(ltv, 0.9), 4) AS p90,
             |  round(quantile_cont(ltv, 0.99), 4) AS p99
             |FROM pu""".stripMargin)),

    // top-k ENTRY PATHS: each user's first three event types (ts +
    // event_id tiebreak, the registry-wide determinism contract) joined
    // into a '>'-path, counted, top 20 by (count desc, path asc). Scale
    // shape: the row_number window and first groupBy ride the SAME
    // user-hash shuffle; the path table is bounded by #event_types³, so
    // the final top-k is a TakeOrdered over a tiny frame — never a
    // global sort of raw events.
    Q("event_topk_paths",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val first3 = ev.withColumn("rn", row_number().over(byUser))
          .filter(col("rn") <= 3)
        // concat_ws skips NULLs, so a <3-event user gets a short path —
        // same as the oracle's ordered string_agg
        val paths = first3.groupBy("user_id").agg(
          concat_ws(">",
            max(when(col("rn") === 1, col("event_type"))),
            max(when(col("rn") === 2, col("event_type"))),
            max(when(col("rn") === 3, col("event_type")))).as("path"))
        paths.groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, cast(ts AS TIMESTAMP) AS ts,
             |    event_type
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_type, ts, event_id FROM ev
             |  QUALIFY row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) <= 3),
             |p AS (
             |  SELECT user_id,
             |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
             |  FROM f GROUP BY user_id),
             |c AS (
             |  SELECT path, cast(count(*) AS BIGINT) AS n_users
             |  FROM p GROUP BY path)
             |SELECT path, n_users FROM c
             |ORDER BY n_users DESC, path LIMIT 20""".stripMargin)),

    // embedding-norm OUTLIER flags per label: a data-quality screen for
    // an embedding corpus (a wrong-scale or all-zero vector shows up as
    // |z| spikes against its label cohort). The L2 norm runs as the
    // native codegen'd vecNorm expression; per-label stats are one
    // groupBy over ≤#labels rows broadcast back — no window over the
    // corpus, no second shuffle of the vectors.
    Q("embed_norm_outliers",
      (s, dir) => {
        val e = emb(s, dir).select(col("vec_id"), col("label"),
          round(vecNorm(col("embedding")), 6).as("nrm"))
        val stats = e.groupBy("label").agg(
          avg(col("nrm")).as("mu"), stddev_pop(col("nrm")).as("sd"))
        e.join(broadcast(stats), Seq("label"))
          .withColumn("z",
            round(try_divide(col("nrm") - col("mu"), col("sd")), 4))
          .select(col("vec_id"), col("label"), col("nrm"),
            round(col("mu"), 4).as("label_mean"), col("z"),
            (abs(col("z")) >= lit(2.5)).as("outlier"))
      },
      Some("""WITH n AS (
             |  SELECT vec_id, label,
             |    round(sqrt(list_sum(list_transform(embedding,
             |      x -> cast(x AS double) * cast(x AS double)))), 6) AS nrm
             |  FROM embeddings),
             |st AS (
             |  SELECT label, avg(nrm) AS mu, stddev_pop(nrm) AS sd
             |  FROM n GROUP BY label)
             |SELECT n.vec_id, n.label, n.nrm,
             |  round(st.mu, 4) AS label_mean,
             |  round((n.nrm - st.mu) / nullif(st.sd, 0), 4) AS z,
             |  abs(round((n.nrm - st.mu) / nullif(st.sd, 0), 4)) >= 2.5
             |    AS outlier
             |FROM n JOIN st USING (label)""".stripMargin)),

    // MULTI-touch attribution: every click in the hour before a purchase
    // shares the credit — linearly (1/n) and time-decayed (1/(1+minutes),
    // a rational kernel chosen over exp() so both engines compute
    // identical doubles with no libm variance). Same scale shape as
    // click_attribution: an EQUI-join on user_id with the time window as
    // a residual filter; the per-purchase normalizations are windows
    // partitioned by purchase_id — bounded frames (touches per purchase),
    // never a global sort.
    Q("multi_touch_attribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        val byPurchase = Window.partitionBy("purchase_id")
        val touches = purchases.join(clicks, Seq("user_id"))
          .filter(col("click_ts") <= col("purchase_ts") &&
            col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
          .withColumn("mins_before",
            (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
              / lit(6e7))
          .withColumn("raw_w", lit(1.0) / (lit(1.0) + col("mins_before")))
          .withColumn("n_touch", count(lit(1)).over(byPurchase))
          .withColumn("w_sum", sum(col("raw_w")).over(byPurchase))
        touches.groupBy(col("click_id"), col("user_id"))
          .agg(count(lit(1)).as("n_purchases"),
            round(sum(lit(1.0) / col("n_touch")), 4).as("linear_credit"),
            round(sum(col("raw_w") / col("w_sum")), 4).as("decay_credit"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_id AS click_id,
             |    cast(ts AS TIMESTAMP) AS click_ts
             |  FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id, event_id AS purchase_id,
             |    cast(ts AS TIMESTAMP) AS purchase_ts
             |  FROM events WHERE event_type = 'purchase'),
             |t AS (
             |  SELECT p.purchase_id, p.user_id, c.click_id,
             |    (epoch_us(p.purchase_ts) - epoch_us(c.click_ts)) / 6e7
             |      AS mins_before
             |  FROM p JOIN c ON c.user_id = p.user_id
             |  WHERE c.click_ts <= p.purchase_ts
             |    AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR),
             |w AS (
             |  SELECT *, 1.0 / (1.0 + mins_before) AS raw_w,
             |    count(*) OVER (PARTITION BY purchase_id) AS n_touch,
             |    sum(1.0 / (1.0 + mins_before)) OVER (
             |      PARTITION BY purchase_id) AS w_sum
             |  FROM t)
             |SELECT click_id, user_id,
             |  cast(count(*) AS BIGINT) AS n_purchases,
             |  round(sum(1.0 / n_touch), 4) AS linear_credit,
             |  round(sum(raw_w / w_sum), 4) AS decay_credit
             |FROM w GROUP BY click_id, user_id""".stripMargin)),

    // audience OVERLAP between event types: exact pairwise Jaccard of
    // user sets. The self-join is on user_id (equi, both sides hash-
    // partitioned by user); a user active in T types expands to T(T−1)/2
    // pair rows — bounded by #types², never by |users|². The per-type
    // audience sizes re-join as a broadcast (≤#types rows).
    Q("event_type_user_overlap",
      (s, dir) => {
        val ut = events(s, dir).select(col("event_type"), col("user_id")).distinct()
        val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
        val pairs = ut.as("a").join(ut.as("b"), "user_id")
          .filter(col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_both"))
        pairs
          .join(broadcast(sizes.select(col("event_type").as("type_a"),
            col("n").as("n_a"))), Seq("type_a"))
          .join(broadcast(sizes.select(col("event_type").as("type_b"),
            col("n").as("n_b"))), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
            col("n_both"),
            round(col("n_both").cast("double") /
              (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
      },
      Some("""WITH ut AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |sizes AS (
             |  SELECT event_type, cast(count(*) AS BIGINT) AS n
             |  FROM ut GROUP BY event_type),
             |pairs AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    cast(count(*) AS BIGINT) AS n_both
             |  FROM ut a JOIN ut b ON a.user_id = b.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
             |  round(cast(p.n_both AS double) / (sa.n + sb.n - p.n_both), 6)
             |    AS jaccard
             |FROM pairs p
             |JOIN sizes sa ON sa.event_type = p.type_a
             |JOIN sizes sb ON sb.event_type = p.type_b""".stripMargin)),

    // day-of-week × hour activity HEATMAP per event type — the seasonal
    // baseline behind the spike detector's trailing window. One groupBy
    // over derived int keys; output is bounded at 7×24×#types rows.
    // Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday — the oracle
    // shifts by one to agree.
    Q("event_hour_heatmap",
      (s, dir) => {
        val ev = events(s, dir)
        ev.groupBy(dayofweek(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hour_of_day"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""SELECT cast(extract(dow FROM cast(ts AS TIMESTAMP)) + 1 AS BIGINT)
             |    AS dow,
             |  cast(extract(hour FROM cast(ts AS TIMESTAMP)) AS BIGINT)
             |    AS hour_of_day,
             |  event_type,
             |  cast(count(*) AS BIGINT) AS n_events,
             |  cast(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // TIME-DECAYED ENGAGEMENT: per-user sum of event value weighted by
    // exp(-ln2/7 · age_days) — the half-life feature a feature store
    // materializes for ranking models. Scale shape: ONE groupBy(user_id)
    // with a map-side-combinable sum; the corpus max-ts is a scalar probe
    // (metadata-scale collect, same precedent as sqTopK's min/max).
    // The decay constant is spelled as the same decimal literal in both
    // engines so the doubles parse identically; the sum is rounded to 4
    // decimals (double-addition order jitter ~1e-13 « 1e-4 granularity).
    Q("time_decay_engagement",
      (s, dir) => {
        val ev = events(s, dir)
        val mx = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
        ev.groupBy(col("user_id"))
          .agg(
            round(sum(col("value") * exp(lit(-0.0990210257942779) *
              ((lit(mx) - unix_micros(col("ts"))).cast("double") / lit(86400000000.0)))), 4)
              .as("decayed_value"),
            round(sum(col("value")), 4).as("raw_value"),
            count(lit(1)).as("n_events"))
      },
      Some("""WITH mx AS (
             |  SELECT max(epoch_us(cast(ts AS TIMESTAMP))) AS m FROM events)
             |SELECT user_id,
             |  round(sum(value * exp(-0.0990210257942779 *
             |    (cast(mx.m - epoch_us(cast(ts AS TIMESTAMP)) AS double)
             |       / 86400000000.0))), 4) AS decayed_value,
             |  round(sum(value), 4) AS raw_value,
             |  cast(count(*) AS BIGINT) AS n_events
             |FROM events, mx GROUP BY user_id""".stripMargin)),

    // ROBUST DAILY-VOLUME ANOMALY DETECTION: per event type, flag days
    // whose count deviates from the type's median by > 2 robust z
    // (0.6745·|x−med|/MAD — the median/MAD estimator that, unlike the
    // spike detector's trailing mean, is immune to the outliers it hunts).
    // Scale shape: daily rollup is one groupBy; both medians are exact
    // `median` aggregates over the BOUNDED daily table (days × types),
    // broadcast back — the raw event table is scanned once.
    Q("event_anomaly_mad",
      (s, dir) => {
        val ev = events(s, dir)
        val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"))
        val med = daily.groupBy("event_type")
          .agg(median(col("n_events")).as("med"))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("n_events").cast("double") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(median(col("adev")).as("mad"))
        dev.join(broadcast(mad), "event_type")
          .withColumn("robust_z",
            round(lit(0.6745) * (col("n_events") - col("med")) /
              nullif(col("mad"), lit(0.0)), 4))
          .select(col("event_type"), col("day"), col("n_events"),
            col("med"), col("mad"), col("robust_z"),
            (abs(coalesce(col("robust_z"), lit(0.0))) > 2.0).as("is_anomaly"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, cast(ts AS DATE) AS day,
             |    cast(count(*) AS BIGINT) AS n_events
             |  FROM events GROUP BY 1, 2),
             |med AS (
             |  SELECT event_type, cast(median(n_events) AS double) AS med
             |  FROM daily GROUP BY 1),
             |dev AS (
             |  SELECT d.*, m.med, abs(cast(d.n_events AS double) - m.med) AS adev
             |  FROM daily d JOIN med m USING (event_type)),
             |mad AS (
             |  SELECT event_type, cast(median(adev) AS double) AS mad
             |  FROM dev GROUP BY 1)
             |SELECT d.event_type, d.day, d.n_events, d.med, a.mad,
             |  round(0.6745 * (d.n_events - d.med) / nullif(a.mad, 0.0), 4)
             |    AS robust_z,
             |  abs(coalesce(round(0.6745 * (d.n_events - d.med)
             |    / nullif(a.mad, 0.0), 4), 0.0)) > 2.0 AS is_anomaly
             |FROM dev d JOIN mad a USING (event_type)""".stripMargin)),

    // SEASONAL-NAIVE FORECAST BACKTEST: forecast each day's per-type
    // volume as the count 7 calendar days earlier and report the error —
    // the baseline every volume-forecasting pipeline must beat before a
    // model earns its keep. Scale shape: one daily rollup, then a self
    // equi-join of the BOUNDED daily table on (type, day−7) — calendar
    // join, not row-lag, so missing days never misalign the season.
    Q("event_seasonal_baseline",
      (s, dir) => {
        val ev = events(s, dir)
        val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val lagged = daily.select(col("event_type").as("lag_type"),
          col("day").as("lag_day"), col("n").as("n_forecast"))
        daily.join(lagged,
            col("event_type") === col("lag_type") &&
              col("lag_day") === date_sub(col("day"), 7))
          .select(col("event_type"), col("day"), col("n").as("n_actual"),
            col("n_forecast"),
            abs(col("n") - col("n_forecast")).as("abs_err"),
            round(abs(col("n") - col("n_forecast")).cast("double") /
              col("n"), 4).as("rel_err"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, cast(ts AS DATE) AS day,
             |    cast(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT a.event_type, a.day, a.n AS n_actual,
             |  f.n AS n_forecast,
             |  abs(a.n - f.n) AS abs_err,
             |  round(cast(abs(a.n - f.n) AS double) / a.n, 4) AS rel_err
             |FROM daily a JOIN daily f
             |  ON f.event_type = a.event_type AND f.day = a.day - 7""".stripMargin)),

    // RFM SEGMENTATION over purchase events: recency (days since last
    // purchase vs corpus max day), frequency, monetary, each bucketed into
    // quartiles 1..4 by comparison against exact type-7 percentile
    // thresholds (computed once over the bounded per-user table and
    // broadcast back — NO global ntile window, which would funnel every
    // user through one task). Thresholds and monetary are rounded to 4
    // decimals in both engines before comparison so bucket edges are
    // bit-stable. Segment 1 = lowest value of the metric (most recent /
    // fewest / least spent).
    Q("user_rfm_segments",
      (s, dir) => {
        val ev = events(s, dir).filter(col("event_type") === "purchase")
        // scalar probe as STRING: decoding a DateType scalar trips on the
        // proleptic-rebase configs; the string round-trips exactly
        val mx = ev.agg(max(to_date(col("ts"))).cast("string")).head().getString(0)
        val rfm = ev.groupBy(col("user_id"))
          .agg(datediff(to_date(lit(mx)), max(to_date(col("ts")))).cast("long").as("recency_days"),
            count(lit(1)).as("frequency"),
            round(sum(col("value")), 4).as("monetary"))
        val th = rfm.agg(
          expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("rt"),
          expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("ft"),
          expr("percentile(monetary, array(0.25, 0.5, 0.75))").as("mt"))
        def seg(c: Column, t: Column): Column =
          (lit(1) + (c > round(element_at(t, 1), 4)).cast("int")
            + (c > round(element_at(t, 2), 4)).cast("int")
            + (c > round(element_at(t, 3), 4)).cast("int")).cast("long")
        rfm.crossJoin(broadcast(th))
          .select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary"),
            seg(col("recency_days"), col("rt")).as("r_seg"),
            seg(col("frequency"), col("ft")).as("f_seg"),
            seg(col("monetary"), col("mt")).as("m_seg"))
      },
      Some("""WITH p AS (
             |  SELECT * FROM events WHERE event_type = 'purchase'),
             |mx AS (SELECT max(cast(ts AS DATE)) AS d FROM p),
             |rfm AS (
             |  SELECT user_id,
             |    cast(date_diff('day', max(cast(ts AS DATE)), mx.d) AS BIGINT)
             |      AS recency_days,
             |    cast(count(*) AS BIGINT) AS frequency,
             |    round(sum(value), 4) AS monetary
             |  FROM p, mx GROUP BY user_id, mx.d),
             |th AS (
             |  SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rt,
             |    quantile_cont(frequency, [0.25, 0.5, 0.75]) AS ft,
             |    quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mt
             |  FROM rfm)
             |SELECT user_id, recency_days, frequency, monetary,
             |  cast(1 + (recency_days > round(rt[1], 4))::int
             |    + (recency_days > round(rt[2], 4))::int
             |    + (recency_days > round(rt[3], 4))::int AS BIGINT) AS r_seg,
             |  cast(1 + (frequency > round(ft[1], 4))::int
             |    + (frequency > round(ft[2], 4))::int
             |    + (frequency > round(ft[3], 4))::int AS BIGINT) AS f_seg,
             |  cast(1 + (monetary > round(mt[1], 4))::int
             |    + (monetary > round(mt[2], 4))::int
             |    + (monetary > round(mt[3], 4))::int AS BIGINT) AS m_seg
             |FROM rfm, th""".stripMargin)),

    // A/B-TEST Z-SCORE: deterministic hash split of users into variants,
    // per-variant conversion (a high-value purchase), and the two-proportion
    // pooled z statistic — the experiment readout every product pipeline
    // computes. Scale shape: one groupBy(user) to the bounded per-user
    // table, then a single global aggregate of four conditional sums
    // (partial-aggregating, no window); everything downstream is scalar
    // arithmetic on exact integers.
    Q("ab_test_zscore",
      (s, dir) => {
        val ev = events(s, dir)
        val users = ev.groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" && col("value") > 90.0,
            1L).otherwise(0L)).as("converted"))
          .withColumn("variant",
            when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
        val pooled = (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b"))
        users.agg(
            sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
            sum(when(col("variant") === "A", col("converted")).otherwise(0L))
              .as("conv_a"),
            sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
            sum(when(col("variant") === "B", col("converted")).otherwise(0L))
              .as("conv_b"))
          .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
            round(col("conv_a").cast("double") / col("n_a"), 6).as("p_a"),
            round(col("conv_b").cast("double") / col("n_b"), 6).as("p_b"),
            round((col("conv_a").cast("double") / col("n_a") -
                col("conv_b").cast("double") / col("n_b")) /
              sqrt(pooled * (lit(1.0) - pooled) *
                (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4)
              .as("z_score"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' AND value > 90.0
             |      THEN 1 ELSE 0 END) AS converted,
             |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
             |  FROM events GROUP BY user_id),
             |a AS (
             |  SELECT
             |    cast(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_a,
             |    cast(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
             |      AS BIGINT) AS conv_a,
             |    cast(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_b,
             |    cast(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
             |      AS BIGINT) AS conv_b
             |  FROM u)
             |SELECT n_a, conv_a, n_b, conv_b,
             |  round(cast(conv_a AS double) / n_a, 6) AS p_a,
             |  round(cast(conv_b AS double) / n_b, 6) AS p_b,
             |  round((cast(conv_a AS double) / n_a - cast(conv_b AS double) / n_b)
             |    / sqrt((cast(conv_a + conv_b AS double) / (n_a + n_b))
             |      * (1.0 - cast(conv_a + conv_b AS double) / (n_a + n_b))
             |      * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score
             |FROM a""".stripMargin)),

    // KAPLAN-MEIER SURVIVAL CURVE for signup→purchase conversion: per
    // user the duration to first purchase after signup (censored at the
    // corpus horizon), then S(t) = Π_{i≤t}(1 − dᵢ/nᵢ). Scale shape: one
    // groupBy(user) → one groupBy(duration) HISTOGRAM (bounded by the
    // observation window, ~30 rows) — the at-risk counts nᵢ and the
    // cumulative product (as exp∘Σln over rounded hazards) both come from
    // TRIANGULAR joins over that bounded histogram, so the unbounded user
    // table is touched exactly once and no global window exists.
    Q("survival_curve",
      (s, dir) => {
        val ev = events(s, dir)
        val horizon = ev.agg(max(to_date(col("ts"))).cast("string")).head().getString(0)
        val perUser = ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "signup", to_date(col("ts"))))
            .as("signup_day"),
            min(when(col("event_type") === "purchase", to_date(col("ts"))))
              .as("purchase_day"))
          .filter(col("signup_day").isNotNull)
          .select(col("user_id"),
            when(col("purchase_day") >= col("signup_day"),
              datediff(col("purchase_day"), col("signup_day")))
              .otherwise(lit(null)).cast("long").as("tte"),
            datediff(to_date(lit(horizon)), col("signup_day")).cast("long")
              .as("cens"))
          .select(col("user_id"),
            coalesce(col("tte"), col("cens")).as("duration"),
            col("tte").isNotNull.as("converted"))
        val hist = perUser.groupBy(col("duration"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("converted"), 1L).otherwise(0L)).as("d"))
        val h2 = hist.select(col("duration").as("dur2"), col("n_total").as("nt2"),
          col("d").as("d2"))
        // n_at_risk(t) = users with duration >= t; hazard rounded to 6 so
        // the downstream ln/exp folds stay bit-aligned across engines
        val risk = hist.join(broadcast(h2), col("dur2") >= col("duration"))
          .groupBy(col("duration"), col("d"))
          .agg(sum(col("nt2")).as("n_at_risk"))
          .withColumn("hazard",
            round(col("d").cast("double") / col("n_at_risk"), 6))
        val r2 = risk.select(col("duration").as("dur2"), col("hazard").as("hz2"))
        risk.join(broadcast(r2), col("dur2") <= col("duration"))
          .groupBy(col("duration"), col("n_at_risk"), col("d"))
          .agg(round(exp(sum(log(lit(1.0) - col("hz2")))), 6).as("survival"))
          .select(col("duration"), col("n_at_risk"), col("d").as("d_events"),
            col("survival"))
      },
      Some("""WITH horizon AS (SELECT max(cast(ts AS DATE)) AS h FROM events),
             |pu AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'signup' THEN cast(ts AS DATE) END)
             |      AS signup_day,
             |    min(CASE WHEN event_type = 'purchase' THEN cast(ts AS DATE) END)
             |      AS purchase_day
             |  FROM events GROUP BY user_id),
             |du AS (
             |  SELECT user_id,
             |    coalesce(
             |      CASE WHEN purchase_day >= signup_day
             |        THEN date_diff('day', signup_day, purchase_day) END,
             |      date_diff('day', signup_day, horizon.h)) AS duration,
             |    (purchase_day >= signup_day) IS TRUE AS converted
             |  FROM pu, horizon WHERE signup_day IS NOT NULL),
             |hist AS (
             |  SELECT cast(duration AS BIGINT) AS duration,
             |    cast(count(*) AS BIGINT) AS n_total,
             |    cast(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM du GROUP BY 1),
             |risk AS (
             |  SELECT a.duration, a.d,
             |    cast(sum(b.n_total) AS BIGINT) AS n_at_risk,
             |    round(cast(a.d AS double) / sum(b.n_total), 6) AS hazard
             |  FROM hist a JOIN hist b ON b.duration >= a.duration
             |  GROUP BY a.duration, a.d)
             |SELECT a.duration, a.n_at_risk, a.d AS d_events,
             |  round(exp(sum(ln(1.0 - b.hazard))), 6) AS survival
             |FROM risk a JOIN risk b ON b.duration <= a.duration
             |GROUP BY a.duration, a.n_at_risk, a.d""".stripMargin)),

    // CHURN LABEL ENGINEERING: the supervised-training labels + features
    // a retention model consumes — churned = silent for the last 7 days
    // of the observation window. One groupBy(user) over one scan; the
    // horizon is a scalar probe. Label logic and features are exact
    // integer/date arithmetic; mean value rounds at 4.
    Q("churn_labels",
      (s, dir) => {
        val ev = events(s, dir)
        val horizon = ev.agg(max(to_date(col("ts"))).cast("string")).head().getString(0)
        ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(to_date(col("ts"))).as("active_days"),
            // value is 2-decimal: sum EXACT cents and TRUNCATE at 4 dp via
            // integer division — round() of the exact rational lands on
            // .00005 ties that the two engines break differently (one row
            // at sf0.1 did exactly that)
            (expr("""(sum(cast(round(value * 100) AS BIGINT)) * 100)
                    | DIV count(*)""".stripMargin) / 10000.0)
              .as("mean_value"),
            datediff(to_date(lit(horizon)), max(to_date(col("ts"))))
              .cast("long").as("recency_days"))
          .withColumn("churned", col("recency_days") > 7)
      },
      Some("""WITH horizon AS (SELECT max(cast(ts AS DATE)) AS h FROM events)
             |SELECT user_id, cast(count(*) AS BIGINT) AS n_events,
             |  cast(count(DISTINCT cast(ts AS DATE)) AS BIGINT) AS active_days,
             |  ((sum(cast(round(value * 100) AS BIGINT)) * 100) // count(*))
             |    / 10000.0 AS mean_value,
             |  cast(date_diff('day', max(cast(ts AS DATE)), horizon.h) AS BIGINT)
             |    AS recency_days,
             |  date_diff('day', max(cast(ts AS DATE)), horizon.h) > 7 AS churned
             |FROM events, horizon GROUP BY user_id, horizon.h""".stripMargin)),

    // CUPED VARIANCE REDUCTION for the A/B readout: adjust each user's
    // experiment-period value by θ·(pre-period value − pre-mean), with
    // θ = cov(pre, post)/var(pre) — the standard trick that shrinks
    // metric variance using pre-experiment behavior without biasing the
    // delta. Everything derives from EXACT integer-cent sums over one
    // groupBy(user) (covariance from Σxy, Σx, Σy — no second pass), so
    // both engines compute identical moments; one bounded final
    // aggregate per variant.
    Q("cuped_adjustment",
      (s, dir) => {
        val ev = events(s, dir)
        val mid = lit("2024-01-16").cast("date")
        val cents = round(col("value") * 100).cast("long")
        val users = ev.groupBy(col("user_id"))
          .agg(sum(when(to_date(col("ts")) < mid, cents).otherwise(0L)).as("pre_c"),
            sum(when(to_date(col("ts")) >= mid, cents).otherwise(0L)).as("post_c"))
          .withColumn("variant",
            when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
        val mom = users.agg(
          count(lit(1)).as("n"), sum(col("pre_c")).as("sx"),
          sum(col("post_c")).as("sy"),
          sum(col("pre_c") * col("pre_c")).as("sxx"),
          sum(col("pre_c") * col("post_c")).as("sxy"))
        val theta = mom.select(col("n"), col("sx"), col("sy"),
          round((col("sxy").cast("double") - col("sx").cast("double") *
            col("sy") / col("n")) /
            (col("sxx").cast("double") - col("sx").cast("double") *
              col("sx") / col("n")), 6).as("theta"),
          round(col("sx").cast("double") / col("n"), 6).as("mean_pre"))
        users.crossJoin(broadcast(theta))
          .withColumn("adj", col("post_c").cast("double") -
            col("theta") * (col("pre_c").cast("double") - col("mean_pre")))
          .groupBy(col("variant"))
          .agg(count(lit(1)).as("n_users"),
            round(sum(col("post_c")).cast("double") / count(lit(1)) / 100.0, 4)
              .as("raw_mean"),
            round(sum(col("adj")) / count(lit(1)) / 100.0, 4).as("cuped_mean"),
            round(first(col("theta")), 6).as("theta"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    sum(CASE WHEN cast(ts AS DATE) < DATE '2024-01-16'
             |      THEN cast(round(value * 100) AS BIGINT) ELSE 0 END) AS pre_c,
             |    sum(CASE WHEN cast(ts AS DATE) >= DATE '2024-01-16'
             |      THEN cast(round(value * 100) AS BIGINT) ELSE 0 END) AS post_c,
             |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
             |  FROM events GROUP BY user_id),
             |m AS (
             |  SELECT count(*) AS n, sum(pre_c) AS sx, sum(post_c) AS sy,
             |    sum(pre_c * pre_c) AS sxx, sum(pre_c * post_c) AS sxy
             |  FROM u),
             |t AS (
             |  SELECT round((cast(sxy AS double) - cast(sx AS double) * sy / n)
             |      / (cast(sxx AS double) - cast(sx AS double) * sx / n), 6)
             |      AS theta,
             |    round(cast(sx AS double) / n, 6) AS mean_pre
             |  FROM m)
             |SELECT variant, cast(count(*) AS BIGINT) AS n_users,
             |  round(cast(sum(post_c) AS double) / count(*) / 100.0, 4)
             |    AS raw_mean,
             |  round(sum(cast(post_c AS double)
             |    - t.theta * (cast(pre_c AS double) - t.mean_pre))
             |    / count(*) / 100.0, 4) AS cuped_mean,
             |  round(max(t.theta), 6) AS theta
             |FROM u, t GROUP BY variant""".stripMargin)),

    // POWER ANALYSIS for the experiment design: the minimum detectable
    // effect at α=0.05 (two-sided) and 80% power given the observed
    // split sizes and base conversion — MDE = (z_α + z_β)·√(2p̄(1−p̄)/n̄)
    // with the textbook constants spelled identically in both engines.
    // Pure scalar arithmetic over the srm_check aggregate.
    Q("power_analysis",
      (s, dir) => {
        val ev = events(s, dir)
        val users = ev.groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" && col("value") > 90.0,
            1L).otherwise(0L)).as("converted"))
          .withColumn("variant",
            when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
        users.agg(
            sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
            sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
            sum(col("converted")).as("n_conv"), count(lit(1)).as("n"))
          .select(col("n_a"), col("n_b"),
            round(col("n_conv").cast("double") / col("n"), 6).as("p_base"),
            round(lit(1.96 + 0.8416) *
              sqrt(lit(2.0) * (col("n_conv").cast("double") / col("n")) *
                (lit(1.0) - col("n_conv").cast("double") / col("n")) /
                ((col("n_a") + col("n_b")).cast("double") / 2.0)), 6)
              .as("mde_abs"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' AND value > 90.0
             |      THEN 1 ELSE 0 END) AS converted,
             |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
             |  FROM events GROUP BY user_id),
             |a AS (
             |  SELECT
             |    cast(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_a,
             |    cast(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_b,
             |    cast(sum(converted) AS BIGINT) AS n_conv,
             |    count(*) AS n
             |  FROM u)
             |SELECT n_a, n_b,
             |  round(cast(n_conv AS double) / n, 6) AS p_base,
             |  round((1.96 + 0.8416)
             |    * sqrt(2.0 * (cast(n_conv AS double) / n)
             |      * (1.0 - cast(n_conv AS double) / n)
             |      / (cast(n_a + n_b AS double) / 2.0)), 6) AS mde_abs
             |FROM a""".stripMargin)),

    // CONVERSION-LAG QUANTILES: per converting user, the lag from first
    // click to the first purchase AFTER it; exact percentiles over the
    // bounded per-user table. One groupBy(user) with conditional
    // min/max aggregates — the window-free form of time-to-convert.
    Q("conversion_lag_quantiles",
      (s, dir) => {
        val ev = events(s, dir)
        val users = ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "click", unix_micros(col("ts"))))
            .as("first_click_us"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        // no broadcast hint: the per-user table is unbounded at scale —
        // this is an equi-join on the user hash (AQE broadcasts at small SF)
        val lags = purch.join(users, Seq("user_id"))
          .filter(col("p_us") >= col("first_click_us"))
          .groupBy(col("user_id"))
          .agg(min(col("p_us")).as("mp"), first(col("first_click_us")).as("fc"))
          // `div`, not `/`: Spark's / on longs is TRUE division (double),
          // the oracle's // floors
          .select(col("user_id"), expr("(mp - fc) div 1000000").as("lag_s"))
        lags.agg(count(lit(1)).as("n_converters"),
          round(expr("percentile(lag_s, 0.25)"), 4).as("p25_s"),
          round(expr("percentile(lag_s, 0.5)"), 4).as("p50_s"),
          round(expr("percentile(lag_s, 0.9)"), 4).as("p90_s"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'click'
             |      THEN epoch_us(cast(ts AS TIMESTAMP)) END) AS first_click_us
             |  FROM events GROUP BY user_id),
             |lags AS (
             |  SELECT p.user_id,
             |    (min(epoch_us(cast(p.ts AS TIMESTAMP))) - max(u.first_click_us))
             |      // 1000000 AS lag_s
             |  FROM events p JOIN u ON u.user_id = p.user_id
             |  WHERE p.event_type = 'purchase'
             |    AND epoch_us(cast(p.ts AS TIMESTAMP)) >= u.first_click_us
             |  GROUP BY p.user_id)
             |SELECT cast(count(*) AS BIGINT) AS n_converters,
             |  round(quantile_cont(lag_s, 0.25), 4) AS p25_s,
             |  round(quantile_cont(lag_s, 0.5), 4) AS p50_s,
             |  round(quantile_cont(lag_s, 0.9), 4) AS p90_s
             |FROM lags""".stripMargin)),

    // SAMPLE-RATIO-MISMATCH check for the A/B split: χ² against the
    // designed 50/50 allocation (the guardrail run BEFORE reading
    // ab_test_zscore — a skewed split invalidates the experiment).
    // One bounded aggregate; χ² and the 95%/1-dof critical value are
    // exact integer-derived arithmetic.
    Q("srm_check",
      (s, dir) => {
        val ev = events(s, dir)
        val users = ev.select(col("user_id")).distinct()
          .withColumn("variant",
            when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
        users.agg(
            sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
            sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"))
          .withColumn("expected", (col("n_a") + col("n_b")).cast("double") / 2.0)
          .select(col("n_a"), col("n_b"),
            round((col("n_a") - col("expected")) * (col("n_a") - col("expected"))
              / col("expected") +
              (col("n_b") - col("expected")) * (col("n_b") - col("expected"))
              / col("expected"), 6).as("chi2"))
          .withColumn("srm_detected", col("chi2") > 3.841)
      },
      Some("""WITH u AS (
             |  SELECT DISTINCT user_id,
             |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
             |  FROM events),
             |a AS (
             |  SELECT
             |    cast(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_a,
             |    cast(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_b
             |  FROM u)
             |SELECT n_a, n_b,
             |  round((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0)
             |    + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0), 6) AS chi2,
             |  (round((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0)
             |    + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0), 6)) > 3.841 AS srm_detected
             |FROM a""".stripMargin)),

    // CONTRASTIVE PAIR MINING for embedding training: per anchor, the
    // hardest positive (same label, max cosine) and hardest negative
    // (different label, max cosine) plus the margin between them. Scale
    // shape = bruteTopK's: the ANCHOR set is small by construction (a
    // training batch) and broadcasts; the corpus streams past it once;
    // both argmaxes are max(struct) aggregates — map-side combinable,
    // no window, no all-pairs.
    Q("contrastive_pairs",
      (s, dir) => {
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
        val anchors = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("anchor_id"),
            col("label").as("anchor_label"),
            col("embedding").as("av"), col("nrm").as("an"))
        val scored = broadcast(anchors).join(e.filter(col("vec_id") >= 20))
          .select(col("anchor_id"), col("anchor_label"), col("vec_id"),
            col("label"),
            round(dotProduct(col("av"), col("embedding")) /
              (col("an") * col("nrm")), 4).as("cos"))
        // max(struct(cos, -vec_id)): ties on cosine resolve to the LOWEST
        // vector id in both engines
        scored.groupBy("anchor_id", "anchor_label")
          .agg(
            max(when(col("label") === col("anchor_label"),
              struct(col("cos"), (-col("vec_id")).as("nid")))).as("pos"),
            max(when(col("label") =!= col("anchor_label"),
              struct(col("cos"), (-col("vec_id")).as("nid")))).as("neg"))
          .select(col("anchor_id"), col("anchor_label"),
            (-col("pos.nid")).as("pos_id"), col("pos.cos").as("pos_cos"),
            (-col("neg.nid")).as("neg_id"), col("neg.cos").as("neg_cos"),
            round(col("pos.cos") - col("neg.cos"), 4).as("margin"))
      },
      Some(s"""WITH a AS (
              |  SELECT vec_id AS anchor_id, label AS anchor_label,
              |    embedding AS av
              |  FROM embeddings WHERE vec_id < 20),
              |sc AS (
              |  SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
              |    round(${cosDuck("a.av", "e.embedding")}, 4) AS cos
              |  FROM a JOIN embeddings e ON e.vec_id >= 20),
              |pos AS (
              |  SELECT anchor_id, vec_id AS pos_id, cos AS pos_cos FROM sc
              |  WHERE label = anchor_label
              |  QUALIFY row_number() OVER (PARTITION BY anchor_id
              |    ORDER BY cos DESC, vec_id ASC) = 1),
              |neg AS (
              |  SELECT anchor_id, vec_id AS neg_id, cos AS neg_cos FROM sc
              |  WHERE label <> anchor_label
              |  QUALIFY row_number() OVER (PARTITION BY anchor_id
              |    ORDER BY cos DESC, vec_id ASC) = 1),
              |base AS (SELECT DISTINCT anchor_id, anchor_label FROM sc)
              |SELECT b.anchor_id, b.anchor_label,
              |  p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
              |  round(p.pos_cos - n.neg_cos, 4) AS margin
              |FROM base b
              |LEFT JOIN pos p ON p.anchor_id = b.anchor_id
              |LEFT JOIN neg n ON n.anchor_id = b.anchor_id""".stripMargin)),

    // inverse-frequency CLASS WEIGHTS over the label column — the
    // balanced-sampling input a classifier trainer consumes. Everything
    // derives from exact integer counts (one tiny groupBy + a broadcast
    // one-row total), so the output is engine-exact.
    Q("label_class_weights",
      (s, dir) => {
        val counts = emb(s, dir).groupBy("label").agg(count(lit(1)).as("n"))
        val tot = counts.agg(sum(col("n")).as("total"),
          count(lit(1)).as("n_labels"))
        counts.crossJoin(broadcast(tot))
          .select(col("label"), col("n"), col("total"),
            round(col("total").cast("double") /
              (col("n_labels") * col("n")), 6).as("balanced_weight"),
            round(col("n").cast("double") / col("total"), 6).as("freq"))
      },
      Some("""WITH c AS (
             |  SELECT label, cast(count(*) AS BIGINT) AS n
             |  FROM embeddings GROUP BY label),
             |t AS (
             |  SELECT cast(sum(n) AS BIGINT) AS total,
             |    cast(count(*) AS BIGINT) AS n_labels
             |  FROM c)
             |SELECT c.label, c.n, t.total,
             |  round(cast(t.total AS double) / (t.n_labels * c.n), 6)
             |    AS balanced_weight,
             |  round(cast(c.n AS double) / t.total, 6) AS freq
             |FROM c, t""".stripMargin)),

    // per-label CENTROID DRIFT between two corpus halves (even/odd
    // vec_id — a deterministic stand-in for yesterday/today): cosine and
    // L2 shift between the half-centroids. The centroid never
    // materializes as an array — vectors explode to (label, dim) cells
    // and every statistic is a plain aggregate, so the operator is two
    // groupBys over #labels × 64 cells regardless of corpus size; the
    // monitoring query a training pipeline runs to catch an embedding-
    // space regression between snapshot builds.
    Q("embed_centroid_drift",
      (s, dir) => {
        val cells = emb(s, dir)
          .select(col("vec_id"), col("label"), posexplode(col("embedding")))
          .select(col("label"), col("pos").as("dim"),
            col("col").cast("double").as("x"),
            pmod(col("vec_id"), lit(2L)).as("half"))
        val dims = cells.groupBy("label", "dim")
          .agg(avg(when(col("half") === 0, col("x"))).as("a"),
            avg(when(col("half") === 1, col("x"))).as("b"))
        dims.groupBy("label")
          .agg(sum(col("a") * col("b")).as("ab"),
            sum(col("a") * col("a")).as("aa"),
            sum(col("b") * col("b")).as("bb"),
            sum((col("a") - col("b")) * (col("a") - col("b"))).as("d2"))
          .select(col("label"),
            round(col("ab") / (sqrt(col("aa")) * sqrt(col("bb"))), 4)
              .as("centroid_cos"),
            round(sqrt(col("d2")), 4).as("l2_shift"))
      },
      Some("""WITH ex AS (
             |  SELECT label, r.dim,
             |    cast(embedding[r.dim] AS double) AS x,
             |    vec_id % 2 AS half
             |  FROM embeddings CROSS JOIN range(1, 65) r(dim)),
             |dims AS (
             |  SELECT label, dim,
             |    avg(x) FILTER (half = 0) AS a,
             |    avg(x) FILTER (half = 1) AS b
             |  FROM ex GROUP BY label, dim)
             |SELECT label,
             |  round(sum(a*b) / (sqrt(sum(a*a)) * sqrt(sum(b*b))), 4)
             |    AS centroid_cos,
             |  round(sqrt(sum((a-b)*(a-b))), 4) AS l2_shift
             |FROM dims GROUP BY label""".stripMargin)),

    // KEY-SKEW diagnostic over a join/shuffle key: top heavy hitters,
    // their share-vs-uniform ratio, and the salt factor the
    // `skew_join_salted` escape hatch would need (ceil of the key's share
    // of a 32-partition shuffle). This is the report a pipeline runs
    // BEFORE a big join to decide between plain shuffle, AQE skew
    // handling, and explicit salting. One groupBy over the key + a
    // broadcast one-row total; the top-k is a TakeOrdered over per-key
    // counts, never a sort of raw rows.
    Q("key_skew_report",
      (s, dir) => {
        val counts = events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("n"))
        val stats = counts.agg(count(lit(1)).as("n_keys"),
          sum(col("n")).as("n_rows"))
        counts.orderBy(col("n").desc, col("user_id")).limit(10)
          .crossJoin(broadcast(stats))
          .select(col("user_id"), col("n"), col("n_keys"), col("n_rows"),
            round(col("n").cast("double") * col("n_keys") / col("n_rows"), 4)
              .as("skew_vs_uniform"),
            greatest(lit(1L),
              ceil(col("n").cast("double") * 32 / col("n_rows")).cast("long"))
              .as("suggested_salt"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, cast(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY user_id),
             |t AS (
             |  SELECT cast(count(*) AS BIGINT) AS n_keys,
             |    cast(sum(n) AS BIGINT) AS n_rows
             |  FROM c)
             |SELECT c.user_id, c.n, t.n_keys, t.n_rows,
             |  round(cast(c.n AS double) * t.n_keys / t.n_rows, 4)
             |    AS skew_vs_uniform,
             |  greatest(1, cast(ceil(cast(c.n AS double) * 32 / t.n_rows)
             |    AS BIGINT)) AS suggested_salt
             |FROM c, t
             |ORDER BY c.n DESC, c.user_id LIMIT 10""".stripMargin)),

    // mergeable QUANTILE sketch table (KLL): per-(source, lang) sketches
    // over document length, merged per source WITHOUT raw data — the
    // distribution dimension of the sketch-table family (`hll_sketch_rollup`
    // = distinct, `topk_sketch_rollup` = frequency). At 100 TB the daily
    // artifact is one ~KB blob per group and any rollup is a merge over
    // blobs, not a rescan + global sort (exact percentiles need one).
    // KLL compaction is RANDOMIZED, so unlike HLL/theta the estimate is
    // only a stable oracle constant while sketches stay below capacity —
    // k=2048 holds every group at the verified scales exact (SketchSpec
    // pins this), and the oracle-facing check is the sketch's own
    // contract anyway: the RANK of the returned quantile, not its value,
    // within ±5% (KLL's guarantee is rank error ~1.65% at k=200).
    Q("kll_quantile_rollup",
      (s, dir) => {
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("source"), col("lang"), col("n_chars"))
        val perGroup = d.groupBy("source", "lang")
          .agg(expr("kll_sketch_agg_bigint(n_chars, 2048)").as("sk"))
        // kll_sketch_merge_bigint is a two-sketch scalar (no merge-agg
        // form exists): fold over the collected per-group blobs — groups
        // per source are few, and below capacity the merged sketch holds
        // the full multiset union, so fold order cannot matter
        val rolled = perGroup.groupBy("source")
          .agg(collect_list(col("sk")).as("ls"))
          .withColumn("sk", expr("aggregate(slice(ls, 2, size(ls) - 1), " +
            "ls[0], (a, x) -> kll_sketch_merge_bigint(a, x))"))
          .select(col("source"),
            expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("est_p50"),
            expr("kll_sketch_get_quantile_bigint(sk, 0.9)").as("est_p90"))
        d.join(rolled, Seq("source"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            avg(when(col("n_chars") <= col("est_p50"), 1.0).otherwise(0.0)).as("r50"),
            avg(when(col("n_chars") <= col("est_p90"), 1.0).otherwise(0.0)).as("r90"))
          .select(col("source"), col("n_docs"),
            (abs(col("r50") - 0.5) <= 0.05).as("p50_rank_ok"),
            (abs(col("r90") - 0.9) <= 0.05).as("p90_rank_ok"))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  true AS p50_rank_ok, true AS p90_rank_ok
             |FROM documents GROUP BY source""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): semantic dedup via embedding
    // clustering — assign every vector to its nearest centroid, keep one
    // representative per cluster (min vec_id), flag members whose cosine
    // to the representative clears the threshold as semantic duplicates.
    // Same deterministic centroid set as ivf_ann (the first 8 corpus
    // vectors; a trained index swaps in k-means means). Scale shape:
    // centroid argmax is a per-row projection against broadcast literals,
    // the representative set is #cells rows (broadcast), so the only
    // shuffle is the per-cell min — the all-pairs intra-cluster compare
    // SemDeDup avoids is avoided here too (compare-to-keeper only).
    Q("semdedup",
      (s, dir) => {
        val k = 8
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
        // centroids AS DATA (ivfCents/ivfAssign): broadcast-join argmax,
        // plan size O(1) in k — see ann_codebook_join for the rationale
        val assigned = ivfAssign(ivfScores(e, ivfCents(e, k)))
        // rename BEFORE the self-joins: keepers derives from assigned, so
        // un-aliased grouping columns would share exprIds with the left side
        val keepers = assigned.groupBy("cell").agg(min("vec_id").as("keeper_id"))
          .withColumnRenamed("cell", "kcell")
        val keeperVecs = assigned
          .join(keepers, assigned("vec_id") === keepers("keeper_id"))
          .select(col("kcell"), col("keeper_id"),
            col("embedding").as("kvec"), col("nrm").as("knrm"))
        assigned.join(broadcast(keeperVecs), col("cell") === col("kcell"))
          .select(col("vec_id"), col("cell"), col("keeper_id"),
            round(dotProduct(col("embedding"), col("kvec")) /
              (col("nrm") * col("knrm")), 4).as("cos_to_keeper"))
          .withColumn("is_dup",
            col("vec_id") =!= col("keeper_id") && col("cos_to_keeper") >= 0.3)
      },
      Some(s"""WITH cent AS (
              |  SELECT vec_id - 10 AS cid, embedding AS cvec
              |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 18),
              |scored AS (
              |  SELECT e.vec_id, c.cid,
              |    round(${cosDuck("e.embedding", "c.cvec")}, 4) AS s
              |  FROM embeddings e, cent c),
              |assigned AS (
              |  SELECT vec_id, cast(cid AS BIGINT) AS cell FROM scored
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
              |    ORDER BY s DESC, cid ASC) = 1),
              |keepers AS (
              |  SELECT cell, min(vec_id) AS keeper_id FROM assigned GROUP BY cell)
              |SELECT a.vec_id, a.cell, k.keeper_id,
              |  round(${cosDuck("e.embedding", "ke.embedding")}, 4) AS cos_to_keeper,
              |  (a.vec_id <> k.keeper_id AND
              |   round(${cosDuck("e.embedding", "ke.embedding")}, 4) >= 0.3) AS is_dup
              |FROM assigned a
              |JOIN keepers k ON k.cell = a.cell
              |JOIN embeddings e ON e.vec_id = a.vec_id
              |JOIN embeddings ke ON ke.vec_id = k.keeper_id""".stripMargin)),

    // Product-quantization ANN (Jégou et al. 2011) — the memory-bound scale
    // path: 64 dims → M=4 subspaces × 16 dims, each subvector quantized to
    // its nearest codebook centroid (L2², rounded, tie → min index), so a
    // corpus vector stores as M small codes. Queries score by ASYMMETRIC
    // DISTANCE: per query, a LUT of dot(q_m, centroid(m,j)) is precomputed
    // (M×ksub doubles) and broadcast; the per-candidate work is M array
    // lookups + adds — no original vectors touched. Codebook is
    // deterministic (subvectors of the first ksub corpus vectors; a trained
    // index swaps in per-subspace k-means); ksub=4 here, 256 in production.
    // Every fold is sequential (aggregate / fused dotProduct), bit-matching
    // the oracle's list_sum.
    Q("pq_ann",
      (s, dir) => pqTopK(s, dir, 3),
      Some(s"""WITH $pqDuckChain
              |SELECT query_id, neighbor_id, approx_cos, cast(rank AS BIGINT) AS rank
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY approx_cos DESC, neighbor_id ASC) AS rank FROM scored)
              |WHERE rank <= 3""".stripMargin)),

    // recall@3 of the PQ index against brute-force ground truth — completes
    // the eval matrix: every index type in the suite (LSH, int8 SQ, PQ)
    // ships with the acceptance eval a pipeline runs before trusting it.
    Q("pq_recall",
      (s, dir) => {
        val truth = bruteTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
        val approx = pqTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1L))
        truth.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
          .withColumn("recall_at_3",
            col("n_found").cast("double") / col("n_true"))
      },
      Some(s"""WITH $pqDuckChain,
              |pq AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY approx_cos DESC, neighbor_id ASC) AS rank FROM scored)
              |  WHERE rank <= 3),
              |brute_scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10),
              |brute AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM brute_scored)
              |  WHERE rank <= 3)
              |SELECT b.query_id, cast(count(*) AS BIGINT) AS n_true,
              |  cast(count(p.neighbor_id) AS BIGINT) AS n_found,
              |  cast(count(p.neighbor_id) AS double) / count(*) AS recall_at_3
              |FROM brute b LEFT JOIN pq p
              |  ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
              |GROUP BY b.query_id""".stripMargin)),

    // int8 scalar-quantization ANN: quantize every dimension to [0,255]
    // against the global corpus min/max (driver-held scalars, like any real
    // SQ index's trained range), coarse-score with the INTEGER quantized
    // dot product — exact arithmetic, so the top-50 shortlist is fully
    // deterministic with no rounding step at all — then rerank the
    // shortlist with the exact float cosine. Scale story: int8 vectors are
    // 4× smaller than float32 (memory-bandwidth-bound scan goes 4× faster);
    // the float vectors are only touched for 50 rows per query. floor(),
    // not round(): round() half-away ties break differently across engines.
    Q("sq_ann",
      (s, dir) => sqTopK(s, dir, 5),
      Some(s"""WITH $sqDuckChain
              |SELECT query_id, neighbor_id, approx_score, cos_sim,
              |  cast(rank AS BIGINT) AS rank
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM rer)
              |WHERE rank <= 5""".stripMargin)),

    // recall@3 of the int8 SQ index against brute-force ground truth — the
    // same acceptance eval as ann_recall, for the quantized index: how much
    // the 4× bandwidth saving costs in result quality. Both pipelines are
    // deterministic, so the metric itself is oracle-checkable.
    Q("sq_recall",
      (s, dir) => {
        val truth = bruteTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
        val approx = sqTopK(s, dir, 3).select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1L))
        truth.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
          .withColumn("recall_at_3",
            col("n_found").cast("double") / col("n_true"))
      },
      Some(s"""WITH $sqDuckChain,
              |sq AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM rer)
              |  WHERE rank <= 3),
              |brute_scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10),
              |brute AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM brute_scored)
              |  WHERE rank <= 3)
              |SELECT b.query_id, cast(count(*) AS BIGINT) AS n_true,
              |  cast(count(s.neighbor_id) AS BIGINT) AS n_found,
              |  cast(count(s.neighbor_id) AS double) / count(*) AS recall_at_3
              |FROM brute b LEFT JOIN sq s
              |  ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
              |GROUP BY b.query_id""".stripMargin)),

    // TRAINED IVF: the composition ivf_ann's comment promises — cells come
    // from one Lloyd refinement over the corpus (same deterministic
    // scheme as kmeans_embed) instead of raw seed vectors, then the
    // standard IVF search: corpus assigned to nearest trained centroid,
    // queries probe their nprobe=2 closest cells, exact cosine within the
    // probed cells only. Centroids are K rows — broadcast everywhere; the
    // only corpus-scale shuffles are the two assignment aggregates.
    Q("ivf_kmeans_ann",
      (s, dir) => {
        val K = 4; val nprobe = 2
        val e = emb(s, dir)
          .withColumn("nrm", vecNorm(col("embedding")))
          .withColumn("v", expr("transform(embedding, x -> cast(x AS double))"))
        val corpus = e.filter(col("vec_id") >= 10)
        val d2c = expr(
          "aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), cast(0 AS double), (acc, x) -> acc + x)")
        val init = corpus.filter(col("vec_id") < 10 + K)
          .select((col("vec_id") - 10).cast("int").as("k"), col("v").as("c"))
        val a1 = corpus.crossJoin(broadcast(init)).withColumn("d2", d2c)
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("k"))).as("m"), first(col("v")).as("v"))
          .select(col("vec_id"), col("v"), col("m.k").as("k"))
        val c1 = a1.groupBy("k")
          .agg(collect_list(struct(col("vec_id"), col("v"))).as("lst"))
          .select(col("k"), expr(
            """transform(
              |  aggregate(array_sort(lst),
              |    transform(sequence(1, 64), z -> cast(0 AS double)),
              |    (acc, t) -> zip_with(acc, t.v, (a, b) -> a + b)),
              |  x -> x / size(lst))""".stripMargin).as("c"))
        val assigned = corpus.crossJoin(broadcast(c1)).withColumn("d2", d2c)
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("k"))).as("m"),
            first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
          .select(col("vec_id"), col("embedding"), col("nrm"), col("m.k").as("cell"))
        import org.apache.spark.sql.expressions.Window
        val wq = Window.partitionBy("query_id").orderBy(col("d2").asc, col("k").asc)
        val probed = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v"),
            col("embedding").as("qv"), col("nrm").as("qn"))
          .crossJoin(broadcast(c1)).withColumn("d2", d2c)
          .withColumn("__rn", row_number().over(wq)).filter(col("__rn") <= nprobe)
          .select(col("query_id"), col("qv"), col("qn"), col("k").as("cell"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
        broadcast(probed).join(assigned, Seq("cell"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(dotProduct(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 4)
              .as("cos_sim"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding,
              |    list_transform(embedding, x -> cast(x AS double)) AS v
              |  FROM embeddings),
              |init AS (SELECT cast(vec_id - 10 AS int) AS k, v AS c
              |         FROM e WHERE vec_id >= 10 AND vec_id < 14),
              |a1 AS (
              |  SELECT vec_id, v, k FROM (
              |    SELECT e.vec_id, e.v, i.k,
              |      list_sum(list_transform(list_zip(e.v, i.c),
              |        s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
              |    FROM e, init i WHERE e.vec_id >= 10)
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) = 1),
              |parts AS (SELECT k, d, vec_id, v[d + 1] AS x
              |          FROM a1, UNNEST(range(0, 64)) AS u(d)),
              |sums AS (SELECT k, d, list_sum(list(x ORDER BY vec_id)) AS s2,
              |                count(*) AS n
              |         FROM parts GROUP BY k, d),
              |c1 AS (SELECT k, list(s2 / n ORDER BY d) AS c FROM sums GROUP BY k),
              |assigned AS (
              |  SELECT vec_id, k AS cell FROM (
              |    SELECT e.vec_id, c1.k,
              |      list_sum(list_transform(list_zip(e.v, c1.c),
              |        s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
              |    FROM e, c1 WHERE e.vec_id >= 10)
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) = 1),
              |query_cells AS (
              |  SELECT vec_id AS query_id, k AS cell FROM (
              |    SELECT e.vec_id, c1.k,
              |      list_sum(list_transform(list_zip(e.v, c1.c),
              |        s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
              |    FROM e, c1 WHERE e.vec_id < 10)
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) <= 2),
              |cands AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |    round(${cosDuck("qe.embedding", "ce.embedding")}, 4) AS cos_sim
              |  FROM query_cells q JOIN assigned a ON a.cell = q.cell
              |  JOIN embeddings qe ON qe.vec_id = q.query_id
              |  JOIN embeddings ce ON ce.vec_id = a.vec_id)
              |SELECT query_id, neighbor_id, cos_sim,
              |  cast(rank AS BIGINT) AS rank
              |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |        ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM cands)
              |WHERE rank <= 3""".stripMargin)),

    // Lloyd's k-means over the embedding corpus (K=4, 2 unrolled
    // iterations, deterministic init = vec_id < K) — the clustering
    // primitive behind SemDeDup / prototype-based curation and IVF cell
    // training. Each iteration: assignment is a broadcast of K centroids
    // against the streamed corpus (never the reverse); recomputation here
    // folds each cell's members in vec_id order (collect_list → sorted
    // fold) so the centroid doubles are bit-identical to the oracle's —
    // the determinism variant for the compare. At corpus scale swap the
    // fold for avg(): same plan shape (one partial-agg shuffle of K×64
    // doubles), order-independent to FP ulps.
    // CENTROID SILHOUETTE per IVF cell: s = (b−a)/max(a,b) with a = the
    // cosine distance to the OWN cell centroid and b = to the best
    // OTHER — the clustering-quality eval for the IVF index (cells with
    // s ≈ 0 leak neighbors into other cells, which is what nprobe > 1
    // compensates for; pairs with ivf_nprobe_sweep). One 8-wide scored
    // explode per vector, a per-vector (bounded, partitioned) top-2
    // window, one groupBy(cell).
    Q("ivf_cell_silhouette",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nlist = 8
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
        // centroids AS DATA (ivfCents/ivfScores): broadcast-join scoring,
        // plan size O(1) in nlist — see ann_codebook_join
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("s").desc, col("cid").asc)
        val top2 = ivfScores(e.filter(col("vec_id") >= 10), ivfCents(e, nlist))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
        val sil = top2.groupBy(col("vec_id"))
          .agg(max(when(col("rn") === 1, col("cid"))).as("cell"),
            max(when(col("rn") === 1, lit(1.0) - col("s"))).as("a"),
            max(when(col("rn") === 2, lit(1.0) - col("s"))).as("b"))
          .withColumn("sil",
            round((col("b") - col("a")) / greatest(col("a"), col("b")), 4))
        sil.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_vectors"),
            round(avg(col("sil")), 4).as("mean_silhouette"),
            round(min(col("sil")), 4).as("min_silhouette"))
      },
      Some(s"""WITH cent AS (
              |  SELECT vec_id - 10 AS cid, embedding AS cvec
              |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 18),
              |scored AS (
              |  SELECT e.vec_id, c.cid,
              |    round(${cosDuck("e.embedding", "c.cvec")}, 4) AS s
              |  FROM embeddings e, cent c WHERE e.vec_id >= 10),
              |top2 AS (
              |  SELECT vec_id, cid, s,
              |    ROW_NUMBER() OVER (PARTITION BY vec_id
              |      ORDER BY s DESC, cid ASC) AS rn
              |  FROM scored QUALIFY rn <= 2),
              |sil AS (
              |  SELECT vec_id,
              |    max(CASE WHEN rn = 1 THEN cid END) AS cell,
              |    round((max(CASE WHEN rn = 2 THEN 1.0 - s END)
              |         - max(CASE WHEN rn = 1 THEN 1.0 - s END))
              |      / greatest(max(CASE WHEN rn = 1 THEN 1.0 - s END),
              |                 max(CASE WHEN rn = 2 THEN 1.0 - s END)), 4) AS sil
              |  FROM top2 GROUP BY vec_id)
              |SELECT cast(cell AS BIGINT) AS cell,
              |  cast(count(*) AS BIGINT) AS n_vectors,
              |  round(avg(sil), 4) AS mean_silhouette,
              |  round(min(sil), 4) AS min_silhouette
              |FROM sil GROUP BY 1""".stripMargin)),

    // DIAGONAL-MAHALANOBIS EMBEDDING OUTLIERS: per-vector Σ_d((x_d−μ_d)/
    // σ_d)² against the corpus whitening stats — catches vectors that
    // are extreme in FEW dimensions, which the norm-only outlier query
    // misses (a normal-length vector can still be 10σ out on one axis).
    // Stats come from the same exact-sum posexplode pass as
    // embed_dim_stats, re-assembled into bounded 64-long arrays and
    // broadcast; the per-vector fold is one sequential zip_with. Top 20
    // by the rounded score, id tiebreak.
    Q("embed_mahalanobis_diag",
      (s, dir) => {
        val e = emb(s, dir)
        val stats = e.select(posexplode(col("embedding")).as(Seq("d", "x")))
          .select(col("d"), col("x").cast("double").as("x"))
          .groupBy("d")
          .agg(count(lit(1)).as("n"), round(sum(col("x")), 4).as("sx"),
            round(sum(col("x") * col("x")), 4).as("sx2"))
          .select(col("d"),
            round(col("sx") / col("n"), 6).as("mu"),
            round(sqrt(col("sx2") / col("n") -
              (col("sx") / col("n")) * (col("sx") / col("n"))), 6).as("sd"))
        val arrs = stats
          .agg(expr("transform(array_sort(collect_list(struct(d, mu))), z -> z.mu)")
            .as("mus"),
            expr("transform(array_sort(collect_list(struct(d, sd))), z -> z.sd)")
              .as("sds"))
        e.crossJoin(broadcast(arrs))
          .select(col("vec_id"), round(expr(
            """aggregate(
              |  zip_with(zip_with(embedding, mus, (x, m) -> cast(x AS double) - m),
              |           sds, (c, s) -> (c / s) * (c / s)),
              |  0.0D, (acc, v) -> acc + v)""".stripMargin), 4).as("m2"))
          .orderBy(col("m2").desc, col("vec_id").asc)
          .limit(20)
      },
      Some("""WITH x AS (
             |  SELECT e.vec_id, d.i AS d,
             |    cast(e.embedding[d.i + 1] AS double) AS x
             |  FROM embeddings e, range(0, 64) AS d(i)),
             |st AS (
             |  SELECT d, count(*) AS n, round(sum(x), 4) AS sx,
             |    round(sum(x * x), 4) AS sx2
             |  FROM x GROUP BY 1),
             |ms AS (
             |  SELECT d, round(sx / n, 6) AS mu,
             |    round(sqrt(sx2 / n - (sx / n) * (sx / n)), 6) AS sd
             |  FROM st),
             |scored AS (
             |  SELECT x.vec_id,
             |    round(sum(((x.x - ms.mu) / ms.sd) * ((x.x - ms.mu) / ms.sd)), 4)
             |      AS m2
             |  FROM x JOIN ms USING (d) GROUP BY x.vec_id)
             |SELECT vec_id, m2 FROM scored
             |ORDER BY m2 DESC, vec_id ASC LIMIT 20""".stripMargin)),

    // PER-DIMENSION EMBEDDING STATS (the whitening table): mean and
    // population std per dimension, computed from EXACT sums of x and x²
    // in one posexplode → groupBy(dim) pass (64 map-side groups — the
    // same never-collect shape as pca_power_iteration; a z-score
    // normalizer broadcasts this table back). Sums round at 4 before the
    // derived stats so both engines divide identical numerators.
    Q("embed_dim_stats",
      (s, dir) => {
        val e = emb(s, dir)
        e.select(posexplode(col("embedding")).as(Seq("d", "x")))
          .select(col("d"), col("x").cast("double").as("x"))
          .groupBy("d")
          .agg(count(lit(1)).as("n"),
            round(sum(col("x")), 4).as("sum_x"),
            round(sum(col("x") * col("x")), 4).as("sum_x2"))
          .select(col("d").cast("long").as("d"), col("n"),
            round(col("sum_x") / col("n"), 6).as("mean"),
            round(sqrt(col("sum_x2") / col("n") -
              (col("sum_x") / col("n")) * (col("sum_x") / col("n"))), 6)
              .as("std_pop"))
      },
      Some("""WITH x AS (
             |  SELECT d.i AS d, cast(e.embedding[d.i + 1] AS double) AS x
             |  FROM embeddings e, range(0, 64) AS d(i)),
             |s AS (
             |  SELECT d, cast(count(*) AS BIGINT) AS n,
             |    round(sum(x), 4) AS sum_x, round(sum(x * x), 4) AS sum_x2
             |  FROM x GROUP BY 1)
             |SELECT d, n, round(sum_x / n, 6) AS mean,
             |  round(sqrt(sum_x2 / n - (sum_x / n) * (sum_x / n)), 6) AS std_pop
             |FROM s""".stripMargin)),

    // PCA TOP COMPONENT by matrix-free power iteration: two in-plan
    // iterations of v ← normalize(Xᵀ(Xv)) from the uniform unit vector.
    // The 100 TB shape: the per-row projection s=x·v is a sequential
    // fold; the back-projection Σᵢ s·xᵢ runs as posexplode →
    // groupBy(dim) — 64 map-side-combinable groups, NEVER a
    // collected corpus (collect_list here would funnel the matrix
    // through one row); the 64-long intermediate vector re-attaches by
    // broadcast. Per-stage rounding (s→6, w→4, v→6) pins both engines
    // to identical folds so the iteration can't drift apart. λ estimate
    // = ‖Xᵀ(Xv₁)‖, the Rayleigh numerator at a unit vector.
    Q("pca_power_iteration",
      (s, dir) => {
        val e = emb(s, dir).select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("v"))
        val s1 = e.withColumn("s",
          expr("round(aggregate(v, 0.0D, (acc, x) -> acc + x * 0.125D), 6)"))
        val w1 = s1.select(col("s"), posexplode(col("v")).as(Seq("d", "x")))
          .groupBy("d").agg(round(sum(col("x") * col("s")), 4).as("w"))
        val v1arr = w1
          .agg(expr("transform(array_sort(collect_list(struct(d, w))), z -> z.w)")
            .as("wArr"), sqrt(sum(col("w") * col("w"))).as("nrm"))
          .select(expr("transform(wArr, x -> round(x / nrm, 6))").as("v1"))
        val s2 = e.crossJoin(broadcast(v1arr))
          .withColumn("s", expr(
            "round(aggregate(zip_with(v, v1, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x), 6)"))
        val w2 = s2.select(col("s"), posexplode(col("v")).as(Seq("d", "x")))
          .groupBy("d").agg(round(sum(col("x") * col("s")), 4).as("w"))
        val n2 = w2.agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
        w2.crossJoin(broadcast(n2))
          .select(col("d").cast("long").as("d"),
            round(col("w") / col("nrm"), 6).as("loading"),
            round(col("nrm"), 4).as("lambda"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
             |  FROM embeddings),
             |s1 AS (
             |  SELECT vec_id, v,
             |    round(list_sum(list_transform(v, x -> x * 0.125)), 6) AS s
             |  FROM e),
             |w1 AS (
             |  SELECT d.i AS d, round(sum(s1.v[d.i + 1] * s1.s), 4) AS w
             |  FROM s1, range(0, 64) AS d(i) GROUP BY 1),
             |n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
             |v1arr AS (
             |  SELECT list(round(w / n1.nrm, 6) ORDER BY d) AS v1
             |  FROM w1, n1 GROUP BY n1.nrm),
             |s2 AS (
             |  SELECT e.vec_id, e.v,
             |    round(list_sum(list_transform(list_zip(e.v, a.v1),
             |      z -> z[1] * z[2])), 6) AS s
             |  FROM e, v1arr a),
             |w2 AS (
             |  SELECT d.i AS d, round(sum(s2.v[d.i + 1] * s2.s), 4) AS w
             |  FROM s2, range(0, 64) AS d(i) GROUP BY 1),
             |n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2)
             |SELECT w2.d, round(w2.w / n2.nrm, 6) AS loading,
             |  round(n2.nrm, 4) AS lambda
             |FROM w2, n2""".stripMargin)),

    // RECIPROCAL-RANK FUSION of two independent ANN indexes (PQ and int8
    // SQ): score = Σ 1/(60+rank) over the lists a neighbor appears in —
    // the standard zero-tuning ensemble that beats either list alone
    // when their error modes differ (compressed-domain vs quantized-dot).
    // One full-outer join of two bounded top-k lists per query; windows
    // partition by query over ≤10 rows.
    Q("rrf_fusion",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val a = pqTopK(s, dir, 5)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_pq"))
        val b = sqTopK(s, dir, 5)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_sq"))
        val fused = a.join(b, Seq("query_id", "neighbor_id"), "full_outer")
          .withColumn("rrf_score", round(
            coalesce(lit(1.0) / (lit(60.0) + col("rank_pq")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60.0) + col("rank_sq")), lit(0.0)), 6))
        val w = Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("neighbor_id").asc)
        fused.withColumn("fused_rank", row_number().over(w).cast("long"))
          .filter(col("fused_rank") <= 3)
          .select(col("query_id"), col("neighbor_id"), col("rank_pq"),
            col("rank_sq"), col("rrf_score"), col("fused_rank"))
      },
      Some(s"""WITH $pqDuckChain,
              |pqr AS (
              |  SELECT query_id, neighbor_id, cast(rank AS BIGINT) AS rank_pq
              |  FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY approx_cos DESC, neighbor_id ASC) AS rank FROM scored)
              |  WHERE rank <= 5),
              |$sqDuckChain,
              |sqr AS (
              |  SELECT query_id, neighbor_id, cast(rank AS BIGINT) AS rank_sq
              |  FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM rer)
              |  WHERE rank <= 5),
              |fused AS (
              |  SELECT coalesce(a.query_id, b.query_id) AS query_id,
              |    coalesce(a.neighbor_id, b.neighbor_id) AS neighbor_id,
              |    a.rank_pq, b.rank_sq,
              |    round(coalesce(1.0 / (60.0 + a.rank_pq), 0.0)
              |      + coalesce(1.0 / (60.0 + b.rank_sq), 0.0), 6) AS rrf_score
              |  FROM pqr a FULL JOIN sqr b
              |    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id)
              |SELECT query_id, neighbor_id, rank_pq, rank_sq, rrf_score,
              |  cast(fused_rank AS BIGINT) AS fused_rank
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY rrf_score DESC, neighbor_id ASC) AS fused_rank
              |  FROM fused)
              |WHERE fused_rank <= 3""".stripMargin)),

    // IVF NPROBE SWEEP: recall@3 against brute-force truth at nprobe ∈
    // 1..4 from ONE corpus scan — the tuning curve that decides the
    // recall/latency trade before an index ships (the IVF analogue of
    // lsh_band_sweep). Cell ranks are computed once; the sweep is an
    // explode + filter over the bounded candidate set.
    Q("ivf_nprobe_sweep",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nlist = 8; val maxProbe = 4
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
        // centroids AS DATA (ivfCents/ivfScores/ivfAssign): plan size
        // O(1) in nlist — see ann_codebook_join
        val scoredAll = ivfScores(e, ivfCents(e, nlist))
        val corpus = ivfAssign(scoredAll.filter(col("vec_id") >= 10))
        val wq = Window.partitionBy(col("vec_id"))
          .orderBy(col("s").desc, col("cid").asc)
        val probed = scoredAll.filter(col("vec_id") < 10)
          .withColumn("cell_rank", row_number().over(wq))
          .filter(col("cell_rank") <= maxProbe)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qn"), col("cid").as("cell"), col("cell_rank"))
        val cands = broadcast(probed).join(corpus, Seq("cell"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("cell_rank"),
            round(dotProduct(col("qv"), col("embedding")) /
              (col("qn") * col("nrm")), 4).as("cos_sim"))
        val swept = cands
          .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
            explode(sequence(lit(1), lit(maxProbe))).as("nprobe"))
          .filter(col("cell_rank") <= col("nprobe"))
        val w = Window.partitionBy(col("nprobe"), col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
        val top3 = swept.withColumn("r", row_number().over(w)).filter(col("r") <= 3)
        val truth = bruteTopK(s, dir, 3)
          .select(col("query_id"), col("neighbor_id")).withColumn("__t", lit(1L))
        top3.join(truth, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("nprobe"), col("query_id"))
          .agg((sum(coalesce(col("__t"), lit(0L))) / lit(3.0)).as("recall"))
          .groupBy(col("nprobe"))
          .agg(count(lit(1)).as("n_queries"),
            round(avg(col("recall")), 6).as("mean_recall_at_3"))
          .select(col("nprobe").cast("long").as("nprobe"), col("n_queries"),
            col("mean_recall_at_3"))
      },
      Some(s"""WITH cent AS (
              |  SELECT vec_id - 10 AS cid, embedding AS cvec
              |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 18),
              |scored AS (
              |  SELECT e.vec_id, c.cid,
              |    round(${cosDuck("e.embedding", "c.cvec")}, 4) AS s
              |  FROM embeddings e, cent c),
              |corpus_cell AS (
              |  SELECT vec_id, cid AS cell FROM scored WHERE vec_id >= 10
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) = 1),
              |query_cells AS (
              |  SELECT vec_id AS query_id, cid AS cell,
              |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC)
              |      AS cell_rank
              |  FROM scored WHERE vec_id < 10
              |  QUALIFY cell_rank <= 4),
              |cands AS (
              |  SELECT q.query_id, c.vec_id AS neighbor_id, q.cell_rank,
              |    round(${cosDuck("qe.embedding", "ce.embedding")}, 4) AS cos_sim
              |  FROM query_cells q JOIN corpus_cell c ON q.cell = c.cell
              |  JOIN embeddings qe ON qe.vec_id = q.query_id
              |  JOIN embeddings ce ON ce.vec_id = c.vec_id),
              |swept AS (
              |  SELECT np.np AS nprobe, s.query_id, s.neighbor_id, s.cos_sim
              |  FROM cands s, range(1, 5) AS np(np)
              |  WHERE s.cell_rank <= np.np),
              |top3 AS (
              |  SELECT * FROM swept
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
              |    ORDER BY cos_sim DESC, neighbor_id ASC) <= 3),
              |brute_scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10),
              |brute AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM brute_scored)
              |  WHERE rank <= 3),
              |perq AS (
              |  SELECT t.nprobe, t.query_id,
              |    sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / 3.0
              |      AS recall
              |  FROM top3 t LEFT JOIN brute b
              |    ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
              |  GROUP BY 1, 2)
              |SELECT nprobe, cast(count(*) AS BIGINT) AS n_queries,
              |  round(avg(recall), 6) AS mean_recall_at_3
              |FROM perq GROUP BY 1""".stripMargin)),

    Q("kmeans_embed",
      (s, dir) => {
        val K = 4
        val e = emb(s, dir).select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("v"))
        // argmin as min(struct(d2, k)) — a partial-aggregating groupBy, so
        // the K× cross-join blowup collapses map-side BEFORE the shuffle
        // (vs a Sort+Window per iteration, which shuffles all K rows per
        // vector); first(v) is safe: v is constant within a vec_id group.
        def assign(cents: DataFrame): DataFrame =
          e.crossJoin(broadcast(cents))
            .withColumn("d2", expr(
              "aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), cast(0 AS double), (acc, x) -> acc + x)"))
            .groupBy("vec_id")
            .agg(min(struct(col("d2"), col("k"))).as("m"), first(col("v")).as("v"))
            .select(col("vec_id"), col("v"), col("m.k").as("k"), col("m.d2").as("d2"))
        val init = e.filter(col("vec_id") < K)
          .select(col("vec_id").cast("int").as("k"), col("v").as("c"))
        val c1 = assign(init).groupBy("k")
          .agg(collect_list(struct(col("vec_id"), col("v"))).as("lst"))
          .select(col("k"), expr(
            """transform(
              |  aggregate(array_sort(lst),
              |    transform(sequence(1, 64), z -> cast(0 AS double)),
              |    (acc, m) -> zip_with(acc, m.v, (a, b) -> a + b)),
              |  x -> x / size(lst))""".stripMargin).as("c"))
        assign(c1).select(col("vec_id"), col("k").as("cell"),
          round(col("d2"), 4).as("d2"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
             |  FROM embeddings),
             |init AS (SELECT cast(vec_id AS int) AS k, v AS c FROM e WHERE vec_id < 4),
             |a1 AS (
             |  SELECT vec_id, v, k, d2 FROM (
             |    SELECT e.vec_id, e.v, i.k,
             |      list_sum(list_transform(list_zip(e.v, i.c),
             |        s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
             |    FROM e, init i)
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) = 1),
             |parts AS (
             |  SELECT k, d, vec_id, v[d + 1] AS x
             |  FROM a1, UNNEST(range(0, 64)) AS u(d)),
             |sums AS (
             |  SELECT k, d, list_sum(list(x ORDER BY vec_id)) AS s, count(*) AS n
             |  FROM parts GROUP BY k, d),
             |c1 AS (SELECT k, list(s / n ORDER BY d) AS c FROM sums GROUP BY k),
             |a2 AS (
             |  SELECT vec_id, k, d2 FROM (
             |    SELECT e.vec_id, c1.k,
             |      list_sum(list_transform(list_zip(e.v, c1.c),
             |        s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
             |    FROM e, c1)
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) = 1)
             |SELECT vec_id, cast(k AS int) AS cell, round(d2, 4) AS d2 FROM a2""".stripMargin)),

    // kNN LABEL-NOISE AUDIT (confident-learning style): each vector's
    // top-5 cosine neighbors vote; a strict majority (≥3) disagreeing
    // with the vector's own label flags it as a suspected labeling
    // error. Candidates come from SIGN-BUCKET blocking (first 3 dims'
    // signs → 8 cells, equi-join) — never the all-pairs cross join; at
    // 100 TB the cells become LSH/IVF buckets, same plan shape. Output
    // is the per-label flag census a dataset-quality pass consumes.
    Q("knn_label_noise",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        def bucket(c: org.apache.spark.sql.Column) =
          (when(element_at(c, 1) >= 0f, 4).otherwise(0) +
            when(element_at(c, 2) >= 0f, 2).otherwise(0) +
            when(element_at(c, 3) >= 0f, 1).otherwise(0))
        val e = emb(s, dir).withColumn("nrm", vecNorm(col("embedding")))
          .withColumn("bkt", bucket(col("embedding")))
        val n = e.select(col("vec_id").as("nb_id"), col("label").as("nb_label"),
          col("embedding").as("nb_emb"), col("nrm").as("nb_nrm"), col("bkt"))
        val scored = e.join(n, Seq("bkt"))
          .filter(col("vec_id") =!= col("nb_id"))
          .select(col("vec_id"), col("label"), col("nb_id"), col("nb_label"),
            round(dotProduct(col("embedding"), col("nb_emb")) /
              (col("nrm") * col("nb_nrm")), 4).as("cos_sim"))
        val wTop = Window.partitionBy("vec_id")
          .orderBy(col("cos_sim").desc, col("nb_id"))
        val top5 = scored.withColumn("rk", row_number().over(wTop))
          .filter(col("rk") <= 5)
        val votes = top5.groupBy("vec_id", "label", "nb_label")
          .agg(count(lit(1)).as("v"))
        val wMaj = Window.partitionBy("vec_id")
          .orderBy(col("v").desc, col("nb_label"))
        val flagged = votes.withColumn("rk", row_number().over(wMaj))
          .filter(col("rk") === 1)
          .withColumn("flag",
            col("nb_label") =!= col("label") && col("v") >= 3)
        flagged.groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("flag"), 1L).otherwise(0L)).as("n_flagged"),
            round(sum(when(col("flag"), 1L).otherwise(0L)).cast("double") /
              count(lit(1)), 4).as("flag_rate"))
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, label, embedding,
              |    (CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END +
              |     CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END +
              |     CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS bkt
              |  FROM embeddings),
              |scored AS (
              |  SELECT a.vec_id, a.label, b.vec_id AS nb_id, b.label AS nb_label,
              |    round(${cosDuck("a.embedding", "b.embedding")}, 4) AS cos_sim
              |  FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id != b.vec_id),
              |top5 AS (
              |  SELECT * FROM scored
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
              |    ORDER BY cos_sim DESC, nb_id) <= 5),
              |votes AS (
              |  SELECT vec_id, label, nb_label, count(*) AS v
              |  FROM top5 GROUP BY 1, 2, 3),
              |maj AS (
              |  SELECT *, nb_label != label AND v >= 3 AS flag FROM votes
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
              |    ORDER BY v DESC, nb_label) = 1)
              |SELECT label, cast(count(*) AS BIGINT) AS n_vecs,
              |  cast(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
              |  round(cast(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS double)
              |    / count(*), 4) AS flag_rate
              |FROM maj GROUP BY 1""".stripMargin)),

    // BUILT-IN session_window IN BATCH, driver-gated: Spark's native
    // session aggregation (events merge while each arrives < 30 min
    // after the session's current end) rolled up per user. The custom
    // sessionizer is already pinned to session_window in unit tests;
    // this row puts the BUILT-IN's exact merge semantics (strict <,
    // same-timestamp merge) under the cross-engine oracle too. One
    // shuffle on user; session state is per-key and bounded.
    Q("session_window_batch",
      (s, dir) => {
        val per = events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n"),
            (max(col("ts")).cast("double") - min(col("ts")).cast("double"))
              .as("span_s"))
        per.groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum("n").as("n_events"),
            round(avg("span_s"), 2).as("avg_span_s"),
            max("n").as("max_session_events"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id,
             |    epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id)) AS gap
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts,
             |    sum(CASE WHEN gap IS NULL OR gap >= 1800 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM o),
             |per AS (
             |  SELECT user_id, sid, cast(count(*) AS BIGINT) AS n,
             |    epoch(max(ts)) - epoch(min(ts)) AS span
             |  FROM s GROUP BY 1, 2)
             |SELECT user_id, cast(count(*) AS BIGINT) AS n_sessions,
             |  cast(sum(n) AS BIGINT) AS n_events,
             |  round(avg(span), 2) AS avg_span_s,
             |  cast(max(n) AS BIGINT) AS max_session_events
             |FROM per GROUP BY 1""".stripMargin))
  )

  /** the SQ index chain as DuckDB CTEs, ending in `rer`
    * (query_id, neighbor_id, approx_score, cos_sim) — shared by the
    * `sq_ann` and `sq_recall` oracles */
  private lazy val sqDuckChain: String =
    s"""mm AS (
       |  SELECT cast(min(list_min(embedding)) AS double) AS lo,
       |         cast(max(list_max(embedding)) AS double) AS hi
       |  FROM embeddings),
       |qz AS (
       |  SELECT vec_id, embedding,
       |    list_transform(embedding, v ->
       |      cast(least(floor((cast(v AS double) - mm.lo) / (mm.hi - mm.lo) * 256.0),
       |                 255.0) AS BIGINT)) AS qv
       |  FROM embeddings, mm),
       |coarse AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    cast(list_sum(list_transform(list_zip(a.qv, b.qv),
       |      s -> s[1] * s[2])) AS BIGINT) AS approx_score
       |  FROM qz a JOIN qz b ON a.vec_id < 10 AND b.vec_id >= 10),
       |short AS (
       |  SELECT * FROM coarse
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx_score DESC, neighbor_id ASC) <= 50),
       |rer AS (
       |  SELECT t.query_id, t.neighbor_id, t.approx_score,
       |    round(${cosDuck("qa.embedding", "qb.embedding")}, 4) AS cos_sim
       |  FROM short t JOIN embeddings qa ON qa.vec_id = t.query_id
       |               JOIN embeddings qb ON qb.vec_id = t.neighbor_id)""".stripMargin
}
