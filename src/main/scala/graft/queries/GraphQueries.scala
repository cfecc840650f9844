package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-round graph algorithms over the CO-PURCHASE graph (part pairs
  * bought together in ≥ 2 orders — the basket_lift association graph
  * re-used as an edge list), widening the CC / PageRank / triangle
  * family with the two remaining production staples:
  *
  *  - k-CORE PEELING (bounded rounds): iteratively drop nodes whose
  *    degree in the surviving subgraph is < k; the 3-core is the dense
  *    cross-sell backbone (merchandising reads: stable product
  *    communities), peeled nodes are incidental co-occurrences.
  *  - MULTI-SOURCE BFS hop distance (bounded rounds): recommendation
  *    radius — how many co-purchase hops from a seed set (promoted
  *    parts, id % 50 = 0) reach each part.
  *
  * Both run a FIXED number of rounds (8 peel / 4 BFS) rather than
  * to-convergence, and both engines execute the SAME unrolled rounds —
  * the Spark loop and the generated DuckDB CTE chain derive from one
  * round-count constant, so the post-round-N state is exact even
  * mid-convergence (at this SF the peel IS converged; verified 940-node
  * 3-core, 1715 BFS-reached nodes — neither trivial). Scale: each round
  * is one semi-join restriction + one degree aggregate over a
  * monotonically shrinking set; lineage is truncated per round
  * (localCheckpoint) so the plan never deepens past one iteration —
  * the same posture as the iterative-parity and CC queries.
  */
object GraphQueries {

  private val PeelRounds = 8
  private val CoreK = 3
  private val BfsRounds = 4

  /** Size-adaptive broadcast (guide §3.1): the per-round node sets are
    * localCheckpointed, and RDD-backed frames report the DEFAULT size to
    * the planner (Long.Max) — so every semi/anti join against them planned
    * as a full SortMergeJoin, shuffling the whole edge set once per join
    * per round. The loop has the exact row count in hand (the frame is
    * already materialized), so make the decision AQE would make with real
    * stats: broadcast while the node set fits the session's broadcast
    * threshold, fall back to the shuffle join when it doesn't — at 100 TB
    * a late-round core CAN be huge, so this stays a runtime size decision,
    * never a blanket hint. Sized at 64 bytes per row: the frames carry
    * 1-2 long columns, but the real broadcast cost is the built hash
    * relation (UnsafeRow + HashedRelation overhead), roughly 3-4x the raw
    * column bytes — 16 B/row under-counted that and could broadcast
    * frames several times over the threshold. */
  private[queries] def bcastIfSmall(df: DataFrame, rows: Long): DataFrame = {
    val thresh = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thresh > 0 && rows * 64 <= thresh) broadcast(df) else df
  }

  /** symmetric co-purchase edges: part pairs sharing ≥ 2 orders. */
  private def symEdges(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e = li.join(b, Seq("l_orderkey"))
      .filter(col("l_partkey") < col("pb"))
      .groupBy(col("l_partkey").as("pa"), col("pb"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select("pa", "pb")
    e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
  }

  private val symSql =
    """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS MATERIALIZED (
      |  SELECT pa AS src, pb AS dst FROM e
      |  UNION ALL
      |  SELECT pb AS src, pa AS dst FROM e)""".stripMargin

  /** the unrolled peel chain: aN = survivors after N rounds. */
  private def peelSql: String = {
    val rounds = (1 to PeelRounds).map { i =>
      val prev = if (i == 1) "a0" else s"a${i - 1}"
      s"""d$i AS (
         |  SELECT e.src AS node, count(*) AS deg FROM sym e
         |  JOIN $prev p1 ON p1.node = e.src
         |  JOIN $prev p2 ON p2.node = e.dst
         |  GROUP BY 1),
         |a$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $CoreK)""".stripMargin
    }.mkString(",\n")
    s"""a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |$rounds""".stripMargin
  }

  /** the unrolled BFS chain: lN = (node, hop) labeled within N rounds. */
  private def bfsSql: String = {
    val rounds = (1 to BfsRounds).map { i =>
      val prev = s"l${i - 1}"
      s"""f$i AS (
         |  SELECT DISTINCT e.dst AS node FROM sym e
         |  JOIN $prev p ON p.node = e.src AND p.hop = ${i - 1}
         |  WHERE e.dst NOT IN (SELECT node FROM $prev)),
         |l$i AS MATERIALIZED (SELECT node, hop FROM $prev
         |        UNION ALL SELECT node, $i AS hop FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS node, 0 AS hop FROM sym WHERE src % 50 = 0),
       |$rounds""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // parts surviving 8 rounds of 3-core peeling, with their degree in
    // the final surviving subgraph.
    Q("kcore_peel",
      (s, dir) => {
        val edges = symEdges(s, dir).localCheckpoint()
        var alive = edges.select(col("src").as("node")).distinct()
          .localCheckpoint()
        var aliveN = alive.count() // frame is materialized — count is free
        def restricted: DataFrame = {
          val a = bcastIfSmall(alive, aliveN)
          edges
            .join(a.select(col("node").as("src")), Seq("src"), "leftsemi")
            .join(a.select(col("node").as("dst")), Seq("dst"), "leftsemi")
        }
        for (_ <- 1 to PeelRounds) {
          alive = restricted
            .groupBy(col("src").as("node"))
            .agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= CoreK).select("node")
            .localCheckpoint()
          aliveN = alive.count()
        }
        restricted
          .groupBy(col("src").as("part_id"))
          .agg(count(lit(1)).as("core_degree"))
      },
      Some(s"""WITH $symSql,
              |$peelSql,
              |fin AS (
              |  SELECT e.src AS part_id, count(*) AS core_degree FROM sym e
              |  JOIN a$PeelRounds p1 ON p1.node = e.src
              |  JOIN a$PeelRounds p2 ON p2.node = e.dst
              |  GROUP BY 1)
              |SELECT part_id, cast(core_degree AS BIGINT) AS core_degree
              |FROM fin""".stripMargin)),

    // hop distance (≤ 4) from the promoted-part seed set {id % 50 = 0}:
    // each round expands the frontier through one equi-join and
    // anti-joins the already-labeled set — per-round work is
    // O(frontier edges), and BFS order makes the first label the min
    // hop.
    Q("bfs_hops",
      (s, dir) => {
        val edges = symEdges(s, dir).localCheckpoint()
        var labeled = edges.select(col("src").as("node")).distinct()
          .filter(col("node") % 50 === 0)
          .withColumn("hop", lit(0)).localCheckpoint()
        var labeledN = labeled.count() // materialized — count is free
        for (i <- 1 to BfsRounds) {
          val lab = bcastIfSmall(labeled, labeledN)
          val frontier = edges
            .join(lab.filter(col("hop") === i - 1)
              .select(col("node").as("src")), Seq("src"), "leftsemi")
            .select(col("dst").as("node")).distinct()
            .join(lab.select("node"), Seq("node"), "left_anti")
            .withColumn("hop", lit(i))
          labeled = labeled.unionByName(frontier).localCheckpoint()
          labeledN = labeled.count()
        }
        labeled.select(col("node").as("part_id"), col("hop").cast("int"))
      },
      Some(s"""WITH $symSql,
              |$bfsSql
              |SELECT node AS part_id, cast(hop AS INT) AS hop
              |FROM l$BfsRounds""".stripMargin)),

    // Link prediction by the Resource-Allocation index (Zhou/Lü/Zhang
    // 2009): candidate pair (a,b) scores Σ 1/deg(n) over shared
    // neighbors n. Scale decisions: (1) pair generation goes through
    // LOW-DEGREE nodes only (deg ≤ 32) — the standard hub-suppression
    // cap that bounds the per-node pair fan-out at deg² ≤ 1024 while
    // discarding only near-zero 1/deg contributions; (2) the score is
    // Σ_d count_d/d over 32 EXACT integer per-degree counts, combined in
    // one fixed-order arithmetic expression — each term is an exact
    // int64 divided by a small int (correctly rounded IEEE division) and
    // the 32-term sum is evaluated in identical textual order on both
    // engines, so the double is bit-identical cross-engine and the
    // top-50 ranking can never hinge on distributed summation order.
    // (The previous exact-integer Σ lcm(1..32)/deg overflowed int64 once
    // a hub pair shared ≳128k deg-2 neighbors — Spark wraps silently
    // while DuckDB errors, a silent divergence at scale.) Existing edges
    // are anti-joined out.
    Q("ra_link_prediction",
      (s, dir) => {
        val sym = symEdges(s, dir).localCheckpoint()
        val low = sym.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .filter(col("deg") <= 32)
        // materialized once: BOTH sides of the pair self-join consume this
        // frame, and uncheckpointed each side re-ran the sym⋈low join and
        // the degree aggregate (the before-plan shows the whole subtree
        // twice with zero exchange reuse — guide §1.2)
        val nbrs = sym
          .join(low.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("src").as("via"), col("dst").as("nbr"), col("deg"))
          .localCheckpoint()
        val degCounts = (1 to 32).map(d =>
          sum(when(col("a.deg") === d, 1L).otherwise(0L)).as(s"c$d"))
        val aggs = degCounts :+ count(lit(1)).as("n_shared")
        val score = (1 to 32).map(d => col(s"c$d").cast("double") / lit(d))
          .reduce(_ + _)
        val pairs = nbrs.as("a")
          .join(nbrs.as("b"),
            col("a.via") === col("b.via") && col("a.nbr") < col("b.nbr"))
          .groupBy(col("a.nbr").as("pa"), col("b.nbr").as("pb"))
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("ra_score", score)
          .select("pa", "pb", "ra_score", "n_shared")
        pairs
          .join(sym.select(col("src").as("pa"), col("dst").as("pb")),
            Seq("pa", "pb"), "left_anti")
          .orderBy(col("ra_score").desc, col("pa"), col("pb"))
          .limit(50)
      },
      Some(s"""WITH $symSql,
              |low AS (
              |  SELECT src AS node, count(*) AS deg FROM sym
              |  GROUP BY 1 HAVING count(*) <= 32),
              |nbrs AS MATERIALIZED (
              |  SELECT e.src AS via, e.dst AS nbr, low.deg
              |  FROM sym e JOIN low ON low.node = e.src),
              |pairs AS (
              |  SELECT a.nbr AS pa, b.nbr AS pb,
              |    ${(1 to 32).map(d =>
                     s"sum(CASE WHEN a.deg = $d THEN 1 ELSE 0 END) AS c$d")
                     .mkString(",\n              |    ")},
              |    cast(count(*) AS BIGINT) AS n_shared
              |  FROM nbrs a JOIN nbrs b
              |    ON a.via = b.via AND a.nbr < b.nbr
              |  GROUP BY 1, 2),
              |scored AS (
              |  SELECT pa, pb,
              |    ${(1 to 32).map(d => s"cast(c$d AS DOUBLE) / $d")
                     .mkString(" + ")} AS ra_score,
              |    n_shared
              |  FROM pairs)
              |SELECT pa, pb, ra_score, n_shared
              |FROM scored
              |WHERE NOT EXISTS (SELECT 1 FROM sym
              |  WHERE sym.src = scored.pa AND sym.dst = scored.pb)
              |ORDER BY ra_score DESC, pa, pb LIMIT 50""".stripMargin))
  )
}
