package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, count, floor => ffloor, greatest, least, lit, max => fmax, min => fmin, shiftleft, shiftright}

/** Deterministic Z-ORDER layout — the shared clustering core behind
  * `TxLogTable.compactZOrder` and `DeltaWrite.optimize(zorderBy = …)`
  * (Delta's `OPTIMIZE … ZORDER BY` analog; reference:
  * datavault4dbt's Databricks target delegates table maintenance to the
  * platform's OPTIMIZE — this is that maintenance op, engine-side).
  *
  * Each clustered column is scaled to a 16-bit bucket over its observed
  * [min, max] (one aggregate pass) and the bucket bits are INTERLEAVED
  * into a z-value; partitioning + sorting by z gives every dimension
  * locality — the space-filling curve's quadrant property — which
  * per-file min/max stats turn into pruning on ANY clustered column.
  *
  * The file routing is RUN-INVARIANT by construction (the round-12
  * `txlog_zorder_optimize` flake class): `repartitionByRange` SAMPLES
  * its boundaries with an RDD-id-dependent seed, so two runs over
  * identical data could pack z-quadrants differently and flip
  * downstream pruning counts. Instead: one EXACT coarse histogram over
  * the top ≤16 z-bits (≤65536 cells — a bounded map-side-combined
  * aggregate at any scale), equal-count boundaries from its cumulative
  * sum, and an exact fid→partition route via precomputed
  * murmur3-representative keys (`repartition(P, rep)` sends fid i to
  * partition i with zero collisions). Skew-aware like range
  * partitioning, but deterministic.
  *
  * Columns must cast order-preservingly to DOUBLE (ints, floats,
  * decimals, timestamps); NULLs share a partition (bucket 0).
  */
object ZCluster {

  /** `df` re-laid-out as exactly `min(targetFiles, distinct coarse
    * cells)` partitions, each a contiguous, sorted z-range — write each
    * partition as one file and every clustered column prunes. Returns
    * `df` unchanged (no exchange) when it is empty. */
  def layout(df: DataFrame, zorderBy: Seq[String], targetFiles: Int): DataFrame = {
    require(zorderBy.nonEmpty && zorderBy.size <= 4,
      s"z-order takes 1-4 columns, got ${zorderBy.size}")
    val aggs = zorderBy.flatMap(c => Seq(
      fmin(col(c).cast("double")).as(s"__mn_$c"),
      fmax(col(c).cast("double")).as(s"__mx_$c"))) :+
      count(lit(1)).as("__n")
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input: nothing to cluster (and min/max are NULL, so the
    // z-math below has no input)
    if (bounds.getLong(bounds.length - 1) == 0L) return df

    val n = zorderBy.size
    val zBits = 16
    val zExpr = zorderBy.zipWithIndex.map { case (c, i) =>
      // an entirely-NULL column yields NULL min/max; degrade that
      // dimension to constant bucket 0 (NULLs share a partition)
      if (bounds.isNullAt(i * 2)) lit(0L)
      else {
        val mn = bounds.getDouble(i * 2)
        val mx = bounds.getDouble(i * 2 + 1)
        val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
        val maxB = (1L << zBits) - 1
        val bucket = least(greatest(
          ffloor((col(c).cast("double") - lit(mn)) / lit(span) * lit(maxB.toDouble)),
          lit(0L)), lit(maxB)).cast("long")
        (0 until zBits).map(j =>
          shiftleft(shiftright(bucket, j).bitwiseAND(lit(1L)), j * n + i))
          .reduce(_ + _)
      }
    }.reduce(_ + _)

    val zdf = df.withColumn("__zv", zExpr)
    val coarseShift = math.max(0, zBits * n - 16)
    val cellCol = shiftright(col("__zv"), coarseShift)
    val hist = zdf.groupBy(cellCol.as("__cell"))
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val totalRows = hist.map(_._2).sum
    val t = math.max(1, targetFiles)
    // equal-count boundaries over the exact histogram's cumulative sum
    val boundaries = {
      val bs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cum = 0L
      var j = 1
      var i = 0
      while (i < hist.length && j < t) {
        cum += hist(i)._2
        while (j < t && cum >= math.ceil(j.toDouble * totalRows / t).toLong) {
          if (i + 1 < hist.length &&
              (bs.isEmpty || hist(i + 1)._1 > bs.last)) bs += hist(i + 1)._1
          j += 1
        }
        i += 1
      }
      bs.toSeq
    }
    val parts = boundaries.length + 1
    val fid = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + (cellCol >= lit(b)).cast("int")
    }
    zdf
      .withColumn("__rep",
        org.apache.spark.sql.functions.element_at(lit(representativeKeys(parts)), fid + 1))
      .repartition(parts, col("__rep"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv", "__rep")
  }

  /** rep(i) = smallest non-negative int whose murmur3(seed 42) lands in
    * partition i of `parts` — so `repartition(parts, lit(reps)(fid))` is
    * an exact identity partitioner over fid. Found in a few probes per
    * slot. */
  def representativeKeys(parts: Int): Array[Int] = {
    val out = new Array[Int](parts)
    val found = new Array[Boolean](parts)
    var left = parts
    var v = 0
    while (left > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
      val p = ((h % parts) + parts) % parts
      if (!found(p)) { found(p) = true; out(p) = v; left -= 1 }
      v += 1
    }
    out
  }

  /** An exact, deterministic router `Column` sending each row of `fid`
    * (0-based, < `parts`) to its own shuffle partition under
    * `repartition(parts, routingKey(fid, parts))`. */
  def routingKey(fid: Column, parts: Int): Column =
    org.apache.spark.sql.functions.element_at(
      lit(representativeKeys(parts)), fid + 1)
}
