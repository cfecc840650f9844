package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators. */
object GraphOps {

  /** Connected components over an undirected pair list: min-label
    * propagation with PATH HALVING — each round a node's label is first
    * lowered to the minimum over its neighbors' labels, then replaced by
    * its label's label (pointer jumping), so a length-d label chain
    * collapses in O(log d) rounds instead of O(d). The fixpoint assigns
    * every node the MINIMUM node id of its component.
    *
    * Measured vs the alternating large-star/small-star alternative and
    * kept ([[graft.tools.CcBench]], 1M nodes, local[16]): the realistic
    * near-dup shape — many small dense components, the only shape an LSH
    * candidate graph can have since the bucket cap bounds every component
    * to a union of ≤cap-size quasi-cliques — converges in ~3 rounds
    * (8.7s); a 2-edges/node random graph in ~20s; the adversarial
    * diameter-10⁶ chain still converges within the 50-round bound (42s,
    * ~20 halving rounds). Star-contraction would cut rounds only on
    * high-diameter graphs that cannot occur upstream, at the price of a
    * second join per round and edge-set rewrites — dropped permanently.
    *
    * Fully distributed: per round one equi-join + one partial-aggregating
    * groupBy + one self-join, lineage truncated per round
    * (`localCheckpoint`); the convergence probe rides the same aggregation
    * (no extra shuffle). Parallelism is right-sized to the edge count — a
    * near-dup graph is a small fraction of its corpus, and an every-round
    * 32-partition shuffle over a few hundred edges is pure scheduler
    * overhead; the same expression picks more partitions as the edge count
    * grows (~500k edges per partition).
    *
    * @param pairs  one row per undirected edge (symmetrized internally);
    *               isolated nodes do not appear in the output
    * @return (`node`, `component`) — component = min node id, every node of
    *         every edge present exactly once
    * @throws IllegalArgumentException when propagation has not converged
    *         within `maxRounds` (never silently partial)
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 50): DataFrame = {
    val s = pairs.sparkSession
    val edges0 = pairs.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionAll(pairs.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .localCheckpoint()
    val nParts = math.max(1L, math.min(s.sparkContext.defaultParallelism.toLong,
      edges0.count() / 500000L)).toInt
    val edges = edges0.repartition(nParts, col("a")).localCheckpoint()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
    var converged = false
    var i = 0
    while (!converged && i < maxRounds) {
      val nbr = labels.withColumnRenamed("node", "__l_node")
        .join(edges, col("__l_node") === col("a"))
        .select(col("b").as("node"), col("component"))
      // carry each node's PREVIOUS label through the same aggregation
      // (each node occurs exactly once in `labels`, so min(__orig) is its
      // old label) — the convergence probe becomes a filter over the
      // already-checkpointed result instead of an extra shuffle join
      val propagated = labels.withColumn("__orig", col("component"))
        .unionByName(nbr.withColumn("__orig",
          lit(null).cast(labels.schema("component").dataType)))
        .groupBy("node")
        .agg(min("component").as("component"), min("__orig").as("__prev"))
        .localCheckpoint() // materialized once: the halving self-join reads it twice
      // path halving: label := label(label). component always names a node
      // of the SAME component (it arrived via an edge walk), and that
      // node's label is ≤ it — so the lookup can only move the label down
      // within the component, preserving both invariants while collapsing
      // label chains exponentially.
      val short = propagated.alias("p")
        .join(propagated.select(col("node").as("__s_node"),
          col("component").as("__s_comp")).alias("s"),
          col("p.component") === col("__s_node"), "left")
        .select(col("p.node").as("node"),
          coalesce(col("__s_comp"), col("p.component")).as("component"),
          col("p.__prev").as("__prev"))
      val upd = short.localCheckpoint() // truncate lineage each round
      converged = upd.filter(col("component") =!= col("__prev")).isEmpty
      labels = upd.drop("__prev")
      i += 1
    }
    // fail LOUDLY rather than emit partially-propagated labels that
    // silently mismatch a full transitive closure
    require(converged, s"connectedComponents: min-label propagation did " +
      s"not converge within $maxRounds rounds (component diameter too large)")
    labels
  }
}
